from novic_tpu.models.config import DecoderModelConfig  # noqa: F401
from novic_tpu.models.prefixed_iter import PrefixedIterDecoder  # noqa: F401
from novic_tpu.models.dud import DudDecoder  # noqa: F401
from novic_tpu.models.base import create_decoder, decoder_class, DECODER_REGISTRY  # noqa: F401
