from .loop import evaluate, evaluate_split, train  # noqa: F401
from .state import TrainState, create_train_state, lr_ladder, make_optimizer  # noqa: F401
from .steps import make_eval_step, make_eval_sweep, make_forward, make_train_step  # noqa: F401
