"""ssd_tpu — a TPU-native silent-speech (EMG → text) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``ajshul/silent-speech-decoder`` reference pipeline (PyTorch/MPS):

* 8-channel 1 kHz surface-EMG log-mel featurization (fused on-TPU kernel)
* Conformer student encoder trained with joint CTC + WavLM-distillation loss
* CTC loss as a log-semiring ``lax.scan`` (on-device; the reference fell back
  to CPU for CTC)
* batched on-device greedy/beam CTC decoding with optional char n-gram LM
  shallow fusion
* data-parallel ``jit`` training over a ``jax.sharding.Mesh``
* the reference's CLI surface: ``index_dataset``, ``preprocessing``,
  ``train``, ``evaluate``, ``build_char_lm``, ``orchestrate``, ``visualize``

Layer map mirrors the reference (see SURVEY.md §1) but the implementation is
TPU-first: static shapes + bucketing, functional transforms, XLA collectives.
"""

__version__ = "0.1.0"
