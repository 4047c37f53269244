from .augment import (  # noqa: F401
    AugmentConfig,
    eval_batch,
    make_noise_windows,
    pad_pool,
    prepare_train_arrays,
    sample_train_batch,
    timeshift,
)
from .dataset import (  # noqa: F401
    DEFAULT_WANTED_WORDS,
    LABEL_SILENCE,
    LABEL_UNKNOWN,
    PackedDataset,
    PackedSplit,
    load_speech_commands,
)
from .splits import DEV, TEST, TRAIN, which_set  # noqa: F401
from .synthetic import generate_dataset, generate_hard_dataset  # noqa: F401
from .wavio import read_wav, read_wav_int16, write_wav  # noqa: F401
