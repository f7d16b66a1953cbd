from novic_tpu.data.config import DataConfig, LoaderInfo  # noqa: F401
