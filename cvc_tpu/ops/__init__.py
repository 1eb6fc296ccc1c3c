from cvc_tpu.ops.primitives import (
    lstm_cell,
    additive_attention_scores,
    masked_softmax,
    masked_xent,
    dropout,
)
from cvc_tpu.ops.box_ops import box_iou

__all__ = [
    "lstm_cell", "additive_attention_scores", "masked_softmax",
    "masked_xent", "dropout", "box_iou",
]
