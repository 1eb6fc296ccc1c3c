"""Train state pytree (params + optimizer state + step counter).

The reference carries (model, optimizer, infos{iter, epoch, best CIDEr})
through torch.save/load (reference: `main.py` checkpoint block; SURVEY.md
§3.5).  Here the analogous bundle is one pytree, donate-able through the
jitted step and serializable with orbax.
"""

from __future__ import annotations

from flax import struct


@struct.dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int

    @staticmethod
    def create(params, optimizer):
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=0)
