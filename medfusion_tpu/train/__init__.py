"""Training runtime: states, EMA, optimized train steps (the reference's
Lightning glue, medical_diffusion/models/model_base.py + trainer configs,
rebuilt as pure jitted step functions)."""

from medfusion_tpu.train.ema import ema_decay, ema_update  # noqa: F401
from medfusion_tpu.train.state import TrainState  # noqa: F401
from medfusion_tpu.train.diffusion import make_diffusion_train_step  # noqa: F401
from medfusion_tpu.train.autoencoder import (  # noqa: F401
    AutoencoderTrainer,
    make_autoencoder_train_step,
)
from medfusion_tpu.train.adversarial import (  # noqa: F401
    AdversarialTrainer,
    GANTrainState,
    make_adversarial_train_step,
)
from medfusion_tpu.train.classifier import (  # noqa: F401
    ClassifierTrainer,
    make_classifier_train_step,
)
from medfusion_tpu.train.flow import make_flow_train_step  # noqa: F401
from medfusion_tpu.train.reflow import (  # noqa: F401
    generate_reflow_pairs,
    make_reflow_train_step,
)
