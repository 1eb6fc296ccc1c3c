from cvc_tpu.training.train_state import TrainState
from cvc_tpu.training.optimizer import make_optimizer, lr_schedule
from cvc_tpu.training.step import make_train_step, make_eval_step

__all__ = ["TrainState", "make_optimizer", "lr_schedule",
           "make_train_step", "make_eval_step"]
