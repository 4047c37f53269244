#!/usr/bin/env bash
# Fetch Google Speech Commands v0.01 into data/speech_dataset/ — equivalent
# of the reference's fetch_data.sh (SURVEY.md §3.5). The build machine for
# this repo has no network; on an online machine this downloads the same
# archive the reference uses. Offline, use the synthetic corpus instead:
#   python -m honk_tpu.cli.manage_audio synth data/speech_dataset
#
# Usage: fetch_data.sh [DEST] [URL]
#   DEST  target directory (default data/speech_dataset)
#   URL   archive override — any curl/wget-able URL including file:// —
#         used by tests to exercise the full download+extract path offline.
set -euo pipefail

DEST="${1:-data/speech_dataset}"
URL="${2:-http://download.tensorflow.org/data/speech_commands_v0.01.tar.gz}"

mkdir -p "$DEST"
if [ -d "$DEST/yes" ]; then
  echo "dataset already present at $DEST"
  exit 0
fi

echo "downloading $URL ..."
if command -v curl >/dev/null; then
  curl -fsSL "$URL" -o "$DEST/speech_commands.tar.gz"
else
  wget -qO "$DEST/speech_commands.tar.gz" "$URL"
fi
tar -xzf "$DEST/speech_commands.tar.gz" -C "$DEST"
rm "$DEST/speech_commands.tar.gz"
echo "done: $(ls "$DEST" | wc -l) entries in $DEST"
