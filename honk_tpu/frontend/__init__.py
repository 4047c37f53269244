from .filters import (  # noqa: F401
    AUDIO_SAMPLES,
    F_MAX,
    F_MIN,
    HOP_LENGTH,
    N_DCT,
    N_FFT,
    N_FRAMES,
    N_MELS,
    N_RFFT,
    SAMPLE_RATE,
    frontend_constants,
)
from .mfcc import compute_mfccs, compute_mfccs_jit, frame_audio  # noqa: F401
from .reference import compute_mfccs_reference  # noqa: F401
