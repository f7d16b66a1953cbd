"""novic_tpu — TPU-native open-vocabulary image classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of pallgeuer/novic
(WACV 2025): given only an image, generate a free-form English object-noun
label in real time. A frozen CLIP-family embedder produces unit-norm
embeddings; a small autoregressive object decoder — trained purely on text
embeddings with on-device unit-sphere noise augmentation — inverts the
embedding into a label via KV-cached greedy/beam/exhaustive decoding.

Layer map (mirrors reference SURVEY.md §1):
  utils/      config + logging + misc (ref: utils.py, logger.py, utils_config.py)
  text/       tokenizers + target tokenization configs (ref: embedders.py:42-435)
  embedders/  frozen CLIP image/text towers, jitted, on-device preprocessing
  data/       embedding caches, noun dataset, noise augmentation, loaders
  models/     object decoder models + KV-cached generation (ref: embedding_decoder.py)
  parallel/   device mesh + sharding helpers (new TPU-first design; no reference analog)
  train/      training loop, optimizer, checkpointing (ref: train.py action=train)
  infer.py    NOVICModel public API (ref: infer.py)
  cli/        action dispatcher (ref: train.py 20 actions)
"""

__version__ = "0.1.0"
