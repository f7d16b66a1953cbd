from novic_tpu.embedders.base import Embedder  # noqa: F401
from novic_tpu.embedders.vit import TextTowerConfig, TextTransformer, VisionTowerConfig, VisionTransformer  # noqa: F401
