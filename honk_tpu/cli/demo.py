"""File-streaming detection demo.

Equivalent of reference ``utils/speech_demo.py`` (microphone + on-screen
labels), adapted to a TPU host with no audio hardware: streams a long wav
file (or synthesizes one with keywords at known positions) through the
streaming detector and prints timestamped detections.

    python -m honk_tpu.cli.demo --checkpoint ckpts/res8 --model res8 \
        [--wav long.wav] [--synth-keywords yes no stop] [--hop-ms 200]
"""

from __future__ import annotations

import argparse

import numpy as np


def synthesize_long_audio(
    keywords, data_dir=None, seconds=10, seed=0, gap_s=1.0, noise_amp=0.02
):
    """Long noise track with synthetic keyword clips at known positions.

    Each keyword occupies 1 s starting at its returned position; ``gap_s``
    of noise-only audio follows each clip (the ground-truth detection
    tests use long gaps to make false-alarm assertions meaningful).
    ``noise_amp`` sets the noise floor; the train pipeline's augmentation
    noise is ~0.01 amplitude, so 0.01 matches the training distribution.
    """
    from ..data.synthetic import DEFAULT_WORDS, _word_signal

    rng = np.random.default_rng(seed)
    sr = 16000
    track = noise_amp * rng.standard_normal(seconds * sr).astype(np.float32)
    positions = []
    t = sr
    for word in keywords:
        if t + sr > len(track):
            break
        idx = DEFAULT_WORDS.index(word)
        clip = _word_signal(idx, speaker=0, n=0, sr=sr, rng=rng).astype(np.float32)
        track[t : t + sr] += clip
        positions.append((t / sr, word))
        t += sr + int(gap_s * sr)
    return np.clip(track, -1, 1), positions


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="honk_tpu.demo", description=__doc__)
    p.add_argument("--model", default="res8")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--wav", default="", help="long wav file to stream")
    p.add_argument("--synth-keywords", nargs="*", default=["yes", "no", "stop"])
    p.add_argument("--hop-ms", type=int, default=200)
    p.add_argument("--threshold", type=float, default=0.6)
    p.add_argument(
        "--online", action="store_true",
        help="drive the O(1)-state online Streamer chunk by chunk instead "
        "of the offline batched path (same detection semantics)",
    )
    args = p.parse_args(argv)

    from ..config import StreamConfig
    from ..serve import LabelService

    service = LabelService(args.model, args.checkpoint)
    if args.wav:
        from ..data import read_wav

        audio, _ = read_wav(args.wav)
        expected = None
    else:
        audio, expected = synthesize_long_audio(args.synth_keywords)
        print("synthesized track with keywords at:", expected)

    cfg = StreamConfig(
        hop_samples=args.hop_ms * 16, detection_threshold=args.threshold
    )
    if args.online:
        from ..stream import StreamDetector, Streamer

        chunk = args.hop_ms * 16
        s = Streamer(service.model, service.variables, cfg, chunk_samples=chunk)
        state = s.reset()
        det = StreamDetector(cfg, chunk)  # O(1) incremental detection
        events = []
        for c in range(len(audio) // chunk):
            state, post = s.process(state, audio[c * chunk : (c + 1) * chunk])
            e = det.step(np.asarray(post))
            if e is not None:
                events.append(
                    {"time_s": e.time_s, "label": service.labels[e.label], "prob": e.score}
                )
    else:
        events = service.evaluate_long(audio, cfg)
    for e in events:
        print(f"  {e['time_s']:6.2f}s  {e['label']:>10}  p={e['prob']:.2f}")
    print(f"{len(events)} detections over {len(audio)/16000:.1f}s audio")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
