"""Verify a stemmer against the reference's compiled js over multiple
fuzz seeds, then freeze 500 fuzz vectors (+ golden samples) into
tests/golden/.

Usage: python tools/freeze_stem_vectors.py <lang> [n_per_seed]
Exits non-zero (and freezes nothing) unless EVERY generated word matches.
"""

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from stem_fuzz import gen_words, ref_stems  # noqa: E402

SEEDS = (7, 13)


def main():
    lang = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    from search_engine_ray.analysis.snowball import SNOWBALL_STEMMERS

    fn = SNOWBALL_STEMMERS[lang]
    all_pairs = []
    for seed in SEEDS:
        words = gen_words(lang, n, seed=seed)
        ref = ref_stems(lang, words)
        bad = [(w, fn(w), r) for w, r in zip(words, ref) if fn(w) != r]
        if bad:
            for w, o, r in bad[:25]:
                print(f"  {w!r}: ours={o!r} ref={r!r}")
            print(f"{lang} seed {seed}: {len(bad)}/{len(words)} MISMATCH")
            sys.exit(1)
        print(f"{lang} seed {seed}: {len(words)}/{len(words)} match")
        all_pairs.extend(zip(words, ref))

    fuzz_path = "tests/golden/snowball_fuzz_vectors.json"
    fuzz = json.load(open(fuzz_path))
    fuzz[lang] = [list(p) for p in all_pairs[:: max(1, len(all_pairs) // 500)]][:500]
    json.dump(fuzz, open(fuzz_path, "w"), ensure_ascii=False, indent=0)

    golden_path = "tests/golden/snowball_vectors.json"
    golden = json.load(open(golden_path))
    if lang not in golden:
        golden[lang] = [list(p) for p in all_pairs[7:: max(1, len(all_pairs) // 30)]][:30]
        json.dump(golden, open(golden_path, "w"), ensure_ascii=False, indent=0)
    print(f"froze {len(fuzz[lang])} fuzz + {len(golden[lang])} golden for {lang}")


if __name__ == "__main__":
    main()
