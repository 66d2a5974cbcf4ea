from medseg.engine.state import TrainState, create_train_state
from medseg.engine.train import make_train_step, TrainLoop
from medseg.engine.pretrain import make_pretrain_step, ConvergenceTracker
from medseg.engine.evaluate import Validator
from medseg.engine.checkpoint import CheckpointManager

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "TrainLoop",
    "make_pretrain_step",
    "ConvergenceTracker",
    "Validator",
    "CheckpointManager",
]
