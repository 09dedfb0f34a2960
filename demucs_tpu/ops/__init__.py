"""NN + DSP primitives for tpu-demix."""

from demucs_tpu.ops.spec import (  # noqa: F401
    cac_pack,
    cac_unpack,
    demucs_ispec,
    demucs_spec,
    hann_window,
    istft,
    pad1d,
    stft,
)
from demucs_tpu.ops.nn import (  # noqa: F401
    conv1d,
    conv2d,
    conv_transpose1d,
    conv_transpose2d,
    gelu,
    glu,
    group_norm,
    layer_norm,
    linear,
)
