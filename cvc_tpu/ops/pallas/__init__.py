from cvc_tpu.ops.pallas.attention import fused_additive_attention
from cvc_tpu.ops.pallas.lstm import fused_lstm_gates
from cvc_tpu.ops.pallas.topk_select import fused_topk_lse
from cvc_tpu.ops.pallas.xent import fused_masked_xent

__all__ = ["fused_additive_attention", "fused_lstm_gates",
           "fused_masked_xent", "fused_topk_lse"]
