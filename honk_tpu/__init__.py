"""honk_tpu — a TPU-native keyword-spotting framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference repo ``ljj7975/honk`` (PyTorch keyword spotting on Google Speech
Commands), redesigned TPU-first:

- ``frontend``: the librosa-recipe MFCC (framing, STFT-as-GEMM, mel, log,
  DCT) as batched jit-able functions and a fused Pallas kernel
  (replaces reference ``utils/manage_audio.py::AudioPreprocessor``).
- ``models``: the cnn-trad-pool2 / cnn-one-* / cnn-t* CNN family and the
  res8/res15/res26 (+narrow) residual family as flax modules
  (replaces reference ``utils/model.py``).
- ``data``: Speech Commands loading with SHA1 split parity and on-device
  augmentation (time-shift, noise mix, silence synthesis)
  (replaces reference ``utils/train.py::SpeechDataset``).
- ``train``: jit-ed data-parallel train/eval steps over a device mesh
  (replaces reference ``utils/train.py::train/evaluate``).
- ``stream``: streaming continuous inference over long audio with a
  persistent feature ring buffer and posterior smoothing
  (replaces reference ``service.py`` stride logic).
- ``parallel``: mesh construction and multi-host runtime (no reference
  equivalent; the reference is single-process single-device).
"""

__version__ = "0.1.0"
