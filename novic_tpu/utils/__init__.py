from novic_tpu.utils.logger import log  # noqa: F401
