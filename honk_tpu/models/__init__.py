from .cnn import SpeechModel  # noqa: F401
from .registry import ConfigType, find_config, find_model  # noqa: F401
from .res import SpeechResModel  # noqa: F401
from .torch_compat import (  # noqa: F401
    flax_to_torch_state_dict,
    load_honk_checkpoint,
    torch_state_dict_to_flax,
)
