from novic_tpu.text.tokenizer import TextTokenizer  # noqa: F401
from novic_tpu.text.target import TargetConfig, TargetTokenizer  # noqa: F401
