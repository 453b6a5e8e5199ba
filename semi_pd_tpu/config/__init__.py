from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.config.model_config import ModelConfig

__all__ = ["ServerArgs", "ModelConfig"]
