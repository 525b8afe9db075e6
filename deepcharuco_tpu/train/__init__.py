from deepcharuco_tpu.train.steps import (
    TrainState,
    create_detector_state,
    create_refinenet_state,
    detector_loss_fn,
    refinenet_loss_fn,
    make_detector_train_step,
    make_refinenet_train_step,
    make_detector_eval_step,
    make_refinenet_eval_step,
)

__all__ = [
    "TrainState",
    "create_detector_state",
    "create_refinenet_state",
    "detector_loss_fn",
    "refinenet_loss_fn",
    "make_detector_train_step",
    "make_refinenet_train_step",
    "make_detector_eval_step",
    "make_refinenet_eval_step",
]
