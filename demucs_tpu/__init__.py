"""tpu-demix: TPU-native music source separation (JAX/XLA/Pallas).

A from-scratch reimplementation of the capability surface of Demucs v4
(reference: DrorT/demucs) designed TPU-first:

- ``demucs_tpu.ops``: DSP + NN primitives (STFT/iSTFT with Demucs padding
  conventions, convs, norms, attention) built on jnp/lax with Pallas kernels
  for the hot paths.
- ``demucs_tpu.models``: pure-functional model families (Demucs v2, HDemucs
  v3, HTDemucs v4) as config dataclasses + parameter pytrees.
- ``demucs_tpu.inference``: batched overlap-add separation engine (the
  reference's ``apply_model`` re-expressed as one jitted array program).
- ``demucs_tpu.zoo``: checkpoint bridge for the reference's ``.th`` model zoo
  and our native serialization format.
- ``demucs_tpu.train``: training stack (solver, augments, EMA, data-parallel
  pjit step).
"""

__version__ = "0.1.0"
