"""Keyword-spotting dataset generator from captioned long-form audio.

Equivalent of the reference's ``keyword_spotting_data_generator/``
subproject (Jaejun Lee's YouTube caption-based KWS data pipeline):
search captioned videos for target keywords, align caption timestamps to
word level, extract ~1 s audio clips per occurrence, and run a quality
evaluation over the extracted clips.

Redesign notes (SURVEY.md §2.1 "YouTube KWS data generator"):
- The caption/alignment/extraction logic is pure and offline-testable;
  network acquisition is a pluggable ``VideoSource`` (the YouTube source
  raises a clear error when network/yt tooling is unavailable, as on
  this machine — zero egress).
- The reference's human labeling UI for clip quality is replaced by a
  model-based scorer: a trained KWS checkpoint labels every extracted
  clip and the report gives per-keyword acceptance stats (the TPU batch
  eval path makes this cheap).
- No pysrt/ffmpeg dependencies: a minimal SRT/VTT parser and the
  in-repo WAV IO (honk_tpu.data.wavio) cover the offline path.
"""

from .align import KeywordOccurrence, find_keyword_occurrences  # noqa: F401
from .extract import extract_clips, write_clips  # noqa: F401
from .fetch import LocalFileSource, VideoSource, YouTubeSource  # noqa: F401
from .quality import evaluate_clips  # noqa: F401
from .srt import Caption, parse_srt, parse_vtt  # noqa: F401
