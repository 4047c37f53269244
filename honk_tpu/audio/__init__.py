from .snippet import AudioSnippet  # noqa: F401
