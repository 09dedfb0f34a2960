from demucs_tpu.grids import main

if __name__ == "__main__":
    main()
