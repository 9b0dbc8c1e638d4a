from grlir.engines.inference import Restorer
from grlir.engines.train import TrainState, create_state, make_eval_step, make_train_step
from grlir.engines.gan import GANLossConfig, GANTrainState, create_gan_state, make_gan_train_step
from grlir.engines.preprocess import make_train_preprocess, mixup, progressive_stage
from grlir.engines.validate import validate, write_results_csv

__all__ = [
    "Restorer", "TrainState", "create_state", "make_eval_step",
    "make_train_step", "GANLossConfig", "GANTrainState", "create_gan_state",
    "make_gan_train_step", "make_train_preprocess", "mixup",
    "progressive_stage", "validate", "write_results_csv",
]
