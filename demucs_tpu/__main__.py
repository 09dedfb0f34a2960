"""``python -m demucs_tpu`` — CLI entry (behavioral ref: demucs/__main__.py)."""

from demucs_tpu.separate import main

if __name__ == "__main__":
    main()
