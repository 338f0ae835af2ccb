"""Measure broadcast spotting-dictionary memory at reference-like scale
(VERDICT round-1 item 7): build 1M synthetic multi-word surface forms and
compare the compact token-id FSA against the round-1 nested dict trie.

Usage: python scripts/dict_memory_probe.py [n_sfs]
Prints one JSON line with resident-set deltas and build/walk timings.
"""

from __future__ import annotations

import json
import random
import sys
import time
import tracemalloc

sys.path.insert(0, ".")

from dbpedia_spotlight_spark.operators.spotter import (  # noqa: E402
    SpotterDictionary,
    _fsa_spans,
)


def synth_rows(n: int):
    rng = random.Random(42)
    words = [f"w{i}" for i in range(50_000)]
    for i in range(n):
        k = rng.choice((1, 1, 2, 2, 3))  # mostly 1-2 word sfs
        sf = " ".join(rng.choice(words) for _ in range(k))
        yield (sf, 10, 20)


def nested_trie_build(rows):
    """Round-1 layout, rebuilt here only for the comparison."""
    from dbpedia_spotlight_spark.operators.tokenizer import stem

    sf_stats, trie = {}, {}
    for sf, annotated, total in rows:
        sf_stats[sf] = (annotated, total)
        node = trie
        for w in sf.split():
            node = node.setdefault(stem(w), {})
        node["$"] = True
    return sf_stats, trie


def measure(label: str, fn):
    tracemalloc.start()
    t0 = time.time()
    obj = fn()
    secs = time.time() - t0
    current, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return obj, {"label": label, "mb": round(current / 1e6, 1),
                 "peak_mb": round(peak / 1e6, 1), "build_s": round(secs, 2)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rows = list(synth_rows(n))

    # warm the stem() LRU cache so build timings compare layouts, not caches
    from dbpedia_spotlight_spark.operators.tokenizer import stem

    for sf, _, _ in rows:
        for w in sf.split():
            stem(w)

    d, compact = measure(
        "compact_fsa", lambda: SpotterDictionary.build(rows)
    )
    probe = ["w17", "w23", "w9999", "nohit", "w1", "w2", "w3"] * 2000
    t0 = time.time()
    _ = _fsa_spans(probe, d)
    walk_s = round(time.time() - t0, 3)

    # persisted-artifact path (round-3 item #2): save once at model-build
    # time, then every annotate job pays one unpickle instead of the
    # serial driver build
    import os
    import tempfile

    art = os.path.join(tempfile.mkdtemp(), "spotter_dict.pkl")
    t0 = time.time()
    d.save(art)
    save_s = round(time.time() - t0, 2)
    t0 = time.time()
    d2 = SpotterDictionary.load(art)
    load_s = round(time.time() - t0, 2)
    assert _fsa_spans(probe, d2) == _fsa_spans(probe, d)
    artifact_mb = round(os.path.getsize(art) / 1e6, 1)
    os.remove(art)
    del d, d2

    _, nested = measure("nested_trie", lambda: nested_trie_build(rows))

    print(json.dumps({
        "n_sfs": n,
        "compact": compact,
        "nested_round1": nested,
        "walk_14k_tokens_s": walk_s,
        "artifact": {"save_s": save_s, "load_s": load_s,
                     "file_mb": artifact_mb,
                     "build_vs_load_speedup":
                         round(compact["build_s"] / max(load_s, 1e-9), 1)},
        "note": "sf stats included in both; remaining compact-side memory is"
        " dominated by the unavoidable sf/stem string interning dicts."
        " build_s is not comparable: the nested rebuild splits on spaces"
        " while the real build runs the reference's \\w+ finditer",
    }))


if __name__ == "__main__":
    main()
