from .streamer import (  # noqa: F401
    BatchStreamer,
    Detection,
    Streamer,
    StreamState,
    detect,
    frame_mfccs,
    smooth_posteriors,
    stream_file,
)
