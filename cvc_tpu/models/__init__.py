from cvc_tpu.models.core import init_params, encode_regions, decode, localize, logits
from cvc_tpu.models.cyclical import cyclical_loss, decode_teacher_forced

__all__ = [
    "init_params", "encode_regions", "decode", "localize", "logits",
    "cyclical_loss", "decode_teacher_forced",
]
