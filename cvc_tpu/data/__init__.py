from cvc_tpu.data.vocab import Vocabulary, PAD_ID, BOS_ID, EOS_ID, UNK_ID
from cvc_tpu.data.pipeline import Batch, make_batches, pad_regions

__all__ = [
    "Vocabulary", "PAD_ID", "BOS_ID", "EOS_ID", "UNK_ID",
    "Batch", "make_batches", "pad_regions",
]
