"""torch.hub entry points (behavioral ref: the reference's hubconf.py, which
just re-exports ``demucs.pretrained.get_model``).

``torch.hub.load("<this repo>", "get_model", name="htdemucs")`` returns the
framework's Model/BagOfModels (JAX param pytrees — the torch dependency is
only hub's loader machinery; weights download through our own zoo).
"""

dependencies = ["jax", "numpy"]

from demucs_tpu.zoo.pretrained import get_model  # noqa: F401,E402
from demucs_tpu.api import Separator  # noqa: F401,E402
