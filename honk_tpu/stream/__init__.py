from .streamer import (  # noqa: F401
    BatchStreamer,
    Detection,
    Streamer,
    StreamState,
    detect,
    detect_stream,
    frame_mfccs,
    smooth_posteriors,
    stream_file,
)
