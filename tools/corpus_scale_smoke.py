"""Corpus-QC scale smoke (VERDICT r4 #6): the docs table is 500 rows at
sf0.01/sf0.1 — nothing there validates TF-IDF / decontamination /
MinHash-dedup-keep behavior at realistic corpus sizes. This tool
generates a deterministic synthetic corpus (default 1M docs, ~200 tokens
each, Zipfian vocab with seeded near-duplicate clusters so LSH has real
work) as a ``documents.parquet`` shard directory, then times the three
headline corpus pipelines over it, printing one JSON line per stage.

Numbers + any discovered cliffs go to BASELINE.md.

Usage: python tools/corpus_scale_smoke.py [tfidf|decontam|dedup ...]
Env:   GRAFT_CORPUS_DOCS (default 1_000_000), GRAFT_CORPUS_CPUS (32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("GRAFT_CORPUS_DOCS", "1000000"))
CPUS = int(os.environ.get("GRAFT_CORPUS_CPUS", "32"))
SHARD = 50_000  # docs per parquet file (resumable, bounded writer memory)
VOCAB = 30_000
DOC_TOKENS = 200
DUP_EVERY = 50  # every 50th doc is a near-dup of the previous one


def corpus_parquet(n_docs: int = N_DOCS, root: str = "/tmp") -> str:
    """Deterministic synthetic corpus at ``root``/corpus_smoke_{n}/ —
    cached across runs (skips fully-written shards via a _DONE marker,
    the sources/io.py resumable-write discipline)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(root, f"corpus_smoke_{n_docs}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    # Zipfian vocabulary of random letter words: real corpora's token
    # distribution AND realistic character-shingle diversity — a "tokN"
    # style vocab collapses the 5-char shingle space so unrelated docs
    # collide in every LSH band and the within-bucket pair explode goes
    # quadratic (discovered by this smoke's first run; see BASELINE.md)
    wrng = np.random.default_rng(99)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array(
        [
            "".join(wrng.choice(letters, size=int(wrng.integers(3, 9))))
            for _ in range(VOCAB)
        ],
        dtype=object,
    )
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    langs = np.array(["en", "de", "fr", "es", "pt"], dtype=object)
    for shard_start in range(0, n_docs, SHARD):
        fn = os.path.join(out, f"part-{shard_start // SHARD:05d}.parquet")
        if os.path.exists(fn):
            continue
        n = min(SHARD, n_docs - shard_start)
        rng = np.random.default_rng(1234 + shard_start)
        lens = rng.integers(DOC_TOKENS // 2, DOC_TOKENS * 2, n)
        toks = vocab[rng.choice(VOCAB, size=int(lens.sum()), p=probs)]
        # ~30% of each doc is doc-specific rare material (hex of a
        # doc-salted counter — the long tail real text has). Without it
        # every unrelated doc pair sits at shingle-Jaccard ~0.4 and the
        # LSH candidate set goes quadratic (~29M pairs at 1M docs,
        # measured) — an unrealistic corpus, not an engine property.
        rare_mask = rng.random(int(lens.sum())) < 0.3
        n_rare = int(rare_mask.sum())
        salts = rng.integers(0, 1 << 48, n_rare)
        toks[rare_mask] = np.array([f"{s:012x}" for s in salts], dtype=object)
        offs = np.concatenate([[0], np.cumsum(lens)])
        texts = [" ".join(toks[offs[i]: offs[i + 1]]) for i in range(n)]
        # seeded near-duplicate clusters: doc i ≡ doc i-1 plus one token
        for i in range(1, n):
            if (shard_start + i) % DUP_EVERY == 0:
                texts[i] = texts[i - 1] + " extra"
        ids = np.arange(shard_start, shard_start + n, dtype=np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs[ids % len(langs)]),
                "source": pa.array([f"src{int(i) % 7}" for i in ids]),
                "n_chars": pa.array([len(s) for s in texts], pa.int64()),
            }
        )
        pq.write_table(t, fn)
    with open(done, "w") as f:
        f.write(str(n_docs))
    return out


def main():
    which = set(sys.argv[1:]) or {"tfidf", "decontam", "dedup"}

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    root = corpus_parquet()
    print(json.dumps({"corpus": {"docs": N_DOCS, "dir": root,
                                 "gen_or_cache_sec": round(time.time() - t0, 1)}}),
          flush=True)
    # the td pipelines read {sf_dir}/documents.parquet — symlink the shard
    # dir under that name
    sf_dir = os.path.join("/tmp", f"corpus_smoke_sf_{N_DOCS}")
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(root, link)

    from mercury_graph_ray.pipelines import training_data as td

    results = {}
    if "tfidf" in which:
        t0 = time.time()
        out = td.docs_tfidf_top_term(sf_dir)
        results["tfidf_top_term"] = {
            "sec": round(time.time() - t0, 1), "rows": len(out),
        }
        print(json.dumps({"tfidf_top_term": results["tfidf_top_term"]}), flush=True)
    if "decontam" in which:
        t0 = time.time()
        out = td.docs_decontaminate(sf_dir)
        results["decontaminate"] = {
            "sec": round(time.time() - t0, 1), "rows": len(out),
        }
        print(json.dumps({"decontaminate": results["decontaminate"]}), flush=True)
    if "dedup" in which:
        t0 = time.time()
        out = td.minhash_dedup_keep(sf_dir)
        kept = int(out["kept"].sum()) if "kept" in getattr(out, "columns", []) else None
        results["minhash_dedup_keep"] = {
            "sec": round(time.time() - t0, 1),
            "rows": len(out),
            "kept": kept,
        }
        print(json.dumps({"minhash_dedup_keep": results["minhash_dedup_keep"]}),
              flush=True)
    print(json.dumps({"summary": results, "n_docs": N_DOCS, "num_cpus": CPUS}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
