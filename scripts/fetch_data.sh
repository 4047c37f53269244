#!/usr/bin/env bash
# Fetch Google Speech Commands v0.01 into data/speech_dataset/ — equivalent
# of the reference's fetch_data.sh (SURVEY.md §3.5). The build machine for
# this repo has no network; on an online machine this downloads the same
# archive the reference uses. Offline, use the synthetic corpus instead:
#   python -m honk_tpu.cli.manage_audio synth data/speech_dataset
set -euo pipefail

URL="http://download.tensorflow.org/data/speech_commands_v0.01.tar.gz"
DEST="${1:-data/speech_dataset}"

mkdir -p "$DEST"
if [ -d "$DEST/yes" ]; then
  echo "dataset already present at $DEST"
  exit 0
fi

echo "downloading speech_commands_v0.01 (~1.4 GB)..."
if command -v curl >/dev/null; then
  curl -L "$URL" -o "$DEST/speech_commands_v0.01.tar.gz"
else
  wget -O "$DEST/speech_commands_v0.01.tar.gz" "$URL"
fi
tar -xzf "$DEST/speech_commands_v0.01.tar.gz" -C "$DEST"
rm "$DEST/speech_commands_v0.01.tar.gz"
echo "done: $(ls "$DEST" | wc -l) entries in $DEST"
