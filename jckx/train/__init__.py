from jckx.train.trainer import Trainer  # noqa: F401
from jckx.train.state import GANTrainState, create_dcgan_state, create_cgan_state  # noqa: F401
from jckx.train.steps import make_dcgan_train_step, make_cgan_train_step, jit_train_step  # noqa: F401
from jckx.train.gan_trainer import DCGANTrainer, CGANTrainer  # noqa: F401
