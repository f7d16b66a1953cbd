from novic_tpu.data.config import DataConfig, LoaderInfo  # noqa: F401
from novic_tpu.data.dataset import EmbeddingDataset  # noqa: F401
from novic_tpu.data.cache import CacheExpectation, EmbeddingCache, EmbeddingCacheWriter  # noqa: F401
from novic_tpu.data.grad_accum import GradAccum  # noqa: F401
from novic_tpu.data.noise import EmbeddingNoise, apply_mean_shift  # noqa: F401
