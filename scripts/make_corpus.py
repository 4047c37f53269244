"""Generate a synthetic Speech Commands corpus (easy or hard mode).

The machine has no network (SURVEY.md §0), so all corpora are synthetic.
Easy mode: well-separated word classes for overfit smoke tests. Hard
mode: confusable formant-trajectory classes + speaker variation + SNR
noise, tuned so the 26-epoch reference recipe lands res8 in the ~85-95%
accuracy band — the recipe-dynamics rehearsal corpus.

    python scripts/make_corpus.py data/hard_v1 --hard --clips_per_word 800
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root")
    p.add_argument("--hard", action="store_true")
    p.add_argument("--clips_per_word", type=int, default=None)
    p.add_argument("--n_speakers", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--snr_db", type=float, nargs=2, default=None)
    p.add_argument("--speaker_spread", type=float, default=None)
    p.add_argument("--formant_jitter", type=float, default=None)
    p.add_argument("--segments_per_word", type=int, default=None,
                   help="2 = permutation-twin two-segment words (temporal-order task)")
    p.add_argument("--word_mode", default=None, choices=["glide", "ngram"],
                   help="ngram = equal-bigram 5-symbol words (receptive-field instrument)")
    args = p.parse_args(argv)

    from honk_tpu.data import generate_dataset, generate_hard_dataset

    kw = {"seed": args.seed}
    for k in ("clips_per_word", "n_speakers", "speaker_spread", "formant_jitter", "segments_per_word", "word_mode"):
        if getattr(args, k, None) is not None:
            kw[k] = getattr(args, k)
    if args.snr_db is not None:
        kw["snr_db"] = tuple(args.snr_db)
    if args.hard:
        root = generate_hard_dataset(args.root, **kw)
        with open(os.path.join(root, "CORPUS.json")) as f:
            print(json.dumps(json.load(f)))
    else:
        kw.pop("snr_db", None)
        kw.pop("speaker_spread", None)
        kw.pop("formant_jitter", None)
        kw.pop("segments_per_word", None)
        kw.pop("word_mode", None)
        root = generate_dataset(args.root, **kw)
        print(json.dumps({"generator": "generate_dataset", "root": root, **kw}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
