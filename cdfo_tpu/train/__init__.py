from .state import TrainState, create_train_state, make_schedule, train_step, eval_step

__all__ = ["TrainState", "create_train_state", "make_schedule", "train_step", "eval_step"]
