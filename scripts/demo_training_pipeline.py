#!/usr/bin/env python
"""One-command training-data pipeline demo — the ops/ layer composed
end-to-end the way a 100 TB pretraining-data build would run:

  pages (url, warc_ts, html, text, lang)
    → language ID (function-word argmax, codegen-only)
    → quality filters: heuristic prose score AND bigram-LM perplexity
      (the CCNet/KenLM shape, LM from a shingle-stats build over the
      corpus itself)
    → exact dedup (hash-groupBy) → near dedup (MinHash-LSH →
      connected components → one survivor per cluster)
    → span-level exact substring dedup (Lee et al. 2021 word-8-grams:
      a templated disclaimer pasted into 1/3 of the docs survives in
      exactly one)
    → deterministic hash-based train/val/test split (RNG-free,
      re-runnable, subset-nested)
    → curation: quality-proportional soft sampling, token-budget
      selection (two-pass histogram threshold — no global sort), and
      the deterministic hash-sharded training-order shuffle
    → BPE: subword vocab learned on the selected corpus (capped word
      dictionary → driver-side merges), per-doc token counts encoded
      distributedly
    → SemDeDup semantic dedup over upstream-encoder embeddings
      (planted paraphrase families — disjoint wording, shared family
      vector — collapse to one member each; token-level stages above
      provably cannot see them)
    → DSIR importance-resampling selection (hashed-ngram weights,
      val split as the target distribution, deterministic top-k)
    → per-stage survivor counts + split sizes as ONE JSON line.

Every stage is a DataFrame transform from search_engine_spark/ops/ —
no driver-side loops; the only Python in the row path is the stemming
Arrow UDF inside the LM tokenization.  Usage:

  python scripts/demo_training_pipeline.py --pages 2000 --master local[8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--quality-min", type=float, default=0.35)
    ap.add_argument("--perplexity-max", type=float, default=1000.0)
    ap.add_argument("--jaccard", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.index.builder import build_shingle_stats, build_index
    from search_engine_spark.ops.dedup import exact_dedup, minhash_dedup
    from search_engine_spark.ops.sampling import split
    from search_engine_spark.ops.textstats import (
        detect_language,
        lm_quality_from_index,
        quality_scores,
    )
    from search_engine_spark.session import get_spark
    from search_engine_spark.synth import synth_pages

    spark = get_spark(app_name="sgs-training-demo", master=args.master,
                      shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="sgs_train_")
    t0 = time.time()
    counts = {}
    try:
        pages = synth_pages(spark, args.pages, num_partitions=8)
        clean = pages.select("url", "text").filter(
            F.col("text").isNotNull() & (F.length("text") > 0)
        )
        # pollute the corpus the way real crawls are polluted — every
        # class below must fall out at a specific funnel stage:
        #   exact duplicates        → exact_dedup
        #   near duplicates (one    → near_dedup (MinHash-LSH)
        #     appended sentence)
        #   gibberish               → LM perplexity
        #   non-English             → language ID
        base100 = clean.limit(100).cache()
        dup_exact = base100.limit(40).select(
            F.concat(F.lit("dup://"), F.col("url")).alias("url"), "text"
        )
        dup_near = base100.select(
            F.concat(F.lit("near://"), F.col("url")).alias("url"),
            F.concat(F.col("text"),
                     F.lit(" trailing boilerplate footer line")).alias("text"),
        )
        # stopword-rich gibberish: passes the heuristic prose gate
        # (healthy stopword/punct ratios) but its content words are
        # unseen by the corpus LM — exactly the class the perplexity
        # filter exists for (keyword stuffing, generated spam)
        _stops = ["the", "of", "and", "to", "in", "is"]
        rng_texts = [
            (f"junk://{i}",
             " ".join(
                 f"{_stops[(i + j) % len(_stops)]} "
                 f"qzv{(i * 37 + j * 13) % 9973}"
                 for j in range(40)
             ) + ".")
            for i in range(60)
        ]
        gibberish = spark.createDataFrame(rng_texts, "url string, text string")
        french = spark.createDataFrame(
            [(f"fr://{i}",
              "le chat est sur la table et il y a des pommes dans le "
              "jardin avec les enfants qui jouent pres de la maison")
             for i in range(30)],
            "url string, text string",
        )
        docs = clean.unionByName(dup_exact).unionByName(dup_near) \
            .unionByName(gibberish).unionByName(french)
        docs.cache()
        counts["input"] = docs.count()

        # 1) language ID — keep English-looking prose
        lang = detect_language(docs, "url", "text")
        keep_lang = lang.filter(F.col("lang") == "en").select(
            F.col("id").alias("url")
        )
        docs_l = docs.join(keep_lang, "url", "left_semi")
        counts["lang_en"] = docs_l.count()

        # 2a) heuristic quality
        q = quality_scores(docs_l, "url", "text")
        keep_q = q.filter(
            F.col("quality_score") >= args.quality_min
        ).select(F.col("id").alias("url"))
        docs_q = docs_l.join(keep_q, "url", "left_semi")
        counts["quality"] = docs_q.count()

        # 2b) LM perplexity (CCNet shape): LM from the corpus itself
        build_index(
            spark, pages, f"{work}/lm_idx", num_buckets=8, block_size=64,
            num_partitions=8, run_extraction=False, index_shingles=True,
        )
        ppl = lm_quality_from_index(
            spark, docs_q, f"{work}/lm_idx", id_col="url"
        )
        keep_p = ppl.filter(
            F.col("perplexity") <= args.perplexity_max
        ).select(F.col("id").alias("url"))
        docs_p = docs_q.join(keep_p, "url", "left_semi")
        counts["perplexity"] = docs_p.count()

        # 3) exact dedup then MinHash-LSH near dedup
        docs_e = exact_dedup(docs_p, "url", "text")
        counts["exact_dedup"] = docs_e.count()
        docs_n = minhash_dedup(
            docs_e, "url", "text", jaccard_threshold=args.jaccard
        )
        counts["near_dedup"] = docs_n.count()

        # each pollution class must fall at its designed stage
        def _n(df, prefix):
            return df.filter(F.col("url").startswith(prefix)).count()

        assert _n(docs_l, "fr://") == 0, "language ID missed French"
        assert _n(docs_q, "junk://") > 0, (
            "stopword-rich gibberish should PASS the heuristic gate"
        )
        assert _n(docs_p, "junk://") == 0, "LM perplexity missed gibberish"
        # dedup keeps ONE survivor per duplicate family — which member
        # survives is the deterministic min-id, possibly the dup:// url
        assert (
            docs_n.groupBy("text")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter("n > 1")
            .count()
            == 0
        ), "exact duplicates survived"
        fams = (
            docs_n.select(
                F.regexp_replace("url", "^(near://|dup://)", "")
                .alias("base")
            )
            .groupBy("base")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert fams.filter("n > 1").count() < 10, (
            "near-duplicate families kept multiple members"
        )

        # 4) span-level exact substring dedup (Lee et al. 2021 shape):
        # paste a templated 14-word disclaimer into ~1/3 of the
        # surviving docs — whole-doc and near dedup CANNOT catch a span
        # inside otherwise-distinct pages; substring_dedup must leave
        # it in exactly ONE document corpus-wide
        from search_engine_spark.ops.dedup import substring_dedup

        disclaimer = ("all rights reserved this content may not be "
                      "reproduced in any form without permission")
        hit = F.pmod(F.xxhash64("url"), F.lit(3)) == 0
        # localCheckpoint: the funnel above (incl. iterative MinHash
        # dedup) would otherwise recompute for EVERY assertion action
        # in this stage — materialize once, then the three counts below
        # and the split stage all read the checkpointed rows
        polluted = docs_n.withColumn(
            "text",
            F.when(hit, F.concat("text", F.lit(" " + disclaimer)))
            .otherwise(F.col("text")),
        ).localCheckpoint()
        n_injected = polluted.filter(
            F.col("text").contains(disclaimer)
        ).count()
        assert n_injected > 1, "span pollution did not happen"
        sdd = substring_dedup(polluted, "url", "text", k=8).localCheckpoint()
        survivors = sdd.filter(
            F.col("clean_text").contains(disclaimer)
        ).count()
        assert survivors == 1, (
            f"disclaimer span survives in {survivors} docs, want 1"
        )
        assert sdd.filter("n_dup_tokens > 0").count() >= n_injected - 1
        docs_s = sdd.select(
            F.col("id").alias("url"), F.col("clean_text").alias("text")
        )
        counts["span_dedup"] = docs_s.count()

        # 5) deterministic split — RNG-free, stable across reruns
        assigned = split(
            docs_s, "url",
            [("train", 0.9), ("val", 0.05), ("test", 0.05)],
        )
        splits = {
            r["_split"]: r["n"]
            for r in assigned.groupBy("_split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert sum(splits.values()) == counts["span_dedup"]
        # monotone funnel
        order = ["input", "lang_en", "quality", "perplexity",
                 "exact_dedup", "near_dedup", "span_dedup"]
        for a, b in zip(order, order[1:]):
            assert counts[b] <= counts[a], (a, b, counts)

        # 6) weighted mixture over the TRAIN split (ops/sampling.
        # mix_corpus): treat domain as the source axis, ask for a
        # token budget at half the available mass — every planned
        # fraction must be <= 1 and the sampled mass must land near
        # each source's target in expectation
        from search_engine_spark.ops.packing import (
            pack_sequences,
            pack_stats,
        )
        from search_engine_spark.ops.sampling import mix_corpus

        # localCheckpoint: the funnel lineage above (incl. iterative
        # near-dedup) is expensive — materialize ONCE, the mix/pack
        # stages below fire several independent actions
        train = (
            assigned.filter(F.col("_split") == "train")
            .withColumn(
                "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
            )
            .withColumn("src", F.parse_url(F.col("url"), F.lit("HOST")))
            .filter(F.col("src").isNotNull())
            .select("url", "src", "n_tokens")
            .localCheckpoint()
        )
        srcs = [r["src"] for r in train.select("src")
                .distinct().collect()]
        weights = {s: 1.0 for s in srcs}
        total_toks = int(
            train.agg(F.sum("n_tokens")).collect()[0][0] * 0.5
        )
        mixed, plan = mix_corpus(
            train, "url", "src", "n_tokens", weights, total_toks
        )
        n_mixed = mixed.count()
        assert 0 < n_mixed <= splits["train"]
        # no-upsample invariant: each source's planned pass count is
        # <= 1 total (a capped source reports (1, 0.0) — a single full
        # pass; an abundant one (0, f<1))
        assert all(0 <= frac <= 1 and full + frac <= 1.0
                   for full, frac in plan.values()), plan

        # 7) sequence packing (ops/packing.pack_sequences): every
        # surviving doc gets a (shard, seq, offset) pack slot; offsets
        # stay inside the budget and fill is sane
        packed = pack_sequences(
            mixed, "url", "n_tokens", budget=2048, n_shards=8
        )
        pstats = pack_stats(packed, "n_tokens", 2048)
        assert packed.count() == n_mixed
        assert packed.filter(
            (F.col("pack_offset") < 0)
            | (F.col("pack_offset") >= 2048)
        ).count() == 0
        # packs counts OCCUPIED budget-chunks per shard, so fill <= 1
        assert 0.0 < pstats["mean_fill"] <= 1.0, pstats
        assert 0.0 <= pstats["straddle_frac"] < 0.6, pstats

        # 8) curation (ops/curation.py): quality-proportional soft
        # sampling, token-budget selection (two-pass histogram
        # threshold, no global sort), and the deterministic
        # training-order shuffle over the final corpus
        from search_engine_spark.ops.curation import (
            quality_sample,
            select_token_budget,
            shuffle_rows,
        )

        # span dedup can empty a doc entirely (every token covered by
        # an earlier duplicate span) — those carry no training signal
        nonempty = docs_s.filter(F.length(F.trim("text")) > 0)
        scored = nonempty.join(
            quality_scores(nonempty, "url", "text")
            .select(F.col("id").alias("url"), "quality_score"),
            "url",
        ).withColumn(
            "n_tokens",
            F.size(
                F.filter(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.length(t) > 0,
                )
            ),
        ).localCheckpoint()
        soft = quality_sample(scored, "url", "quality_score")
        n_soft = soft.count()
        assert 0 < n_soft <= counts["span_dedup"]
        total_mass = scored.agg(F.sum("n_tokens")).collect()[0][0]
        budget = int(total_mass * 0.5)
        selected = select_token_budget(
            scored, "url", "quality_score", "n_tokens", budget,
            n_bins=100,
        ).localCheckpoint()
        sel_mass = selected.agg(F.sum("n_tokens")).collect()[0][0]
        # the op's guarantee: kept mass is within ONE quality-bin's
        # mass of the budget — bound by the FATTEST bin (quality
        # scores cluster, so a bin can hold far more than 1% of mass)
        max_bin_mass = (
            scored.groupBy(
                F.least(
                    F.floor(
                        F.least(
                            F.greatest(
                                F.col("quality_score").cast("double"),
                                F.lit(0.0),
                            ),
                            F.lit(1.0),
                        )
                        * 100
                    ).cast("long"),
                    F.lit(99).cast("long"),
                )
            )
            .agg(F.sum("n_tokens").alias("m"))
            .agg(F.max("m"))
            .collect()[0][0]
        )
        assert abs(sel_mass - budget) <= max_bin_mass + 1, (
            sel_mass, budget, max_bin_mass)
        ordered = shuffle_rows(selected, "url", n_shards=8)
        per_shard = (
            ordered.groupBy("shuffle_shard")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("shuffle_pos").alias("mx"))
            .collect()
        )
        assert all(r["mx"] == r["n"] - 1 for r in per_shard), (
            "shuffle positions not dense per shard")
        counts["quality_sampled"] = n_soft
        counts["budget_selected"] = selected.count()

        # 9) BPE: learn a subword vocab on the selected corpus (capped
        # word dictionary -> driver-side merges), count tokens per doc
        # distributedly; spot-check one doc against the pure-Python
        # encoder
        from search_engine_spark.ops import bpe as B

        merges = B.train_bpe(
            B.top_words(selected, "text", 500), 64
        )
        assert len(merges) > 0
        bpe_counts = B.bpe_token_counts(
            selected, "url", "text", merges
        )
        joined = bpe_counts.join(
            selected.select(F.col("url").alias("id"), "text", "n_tokens"),
            "id",
        ).localCheckpoint()
        # every word emits >= 1 subword token (n_tokens counts
        # whitespace words with empty fragments filtered, so it equals
        # the BPE pre-tokenizer's word count)
        assert joined.filter(
            F.col("n_bpe_tokens") < F.col("n_tokens")
        ).count() == 0
        one = joined.first()
        assert one["n_bpe_tokens"] == len(
            B.encode_py(one["text"], B._ranks(merges))
        ), "distributed encode disagrees with the Python encoder"
        mean_bpe = joined.agg(
            F.avg(F.col("n_bpe_tokens") / F.col("n_tokens"))
        ).collect()[0][0]

        # 10) SEMANTIC dedup (SemDeDup, ops/dedup.py:semdedup) over the
        # surviving corpus.  Embeddings come from an UPSTREAM encoder in
        # a real pipeline; here they are synthesized deterministically
        # per semantic family: paraphrase pollution — same meaning,
        # disjoint wording — is invisible to every token-level stage
        # above, so we plant 10 two-member families among the survivors
        # (pairs of DISTINCT docs sharing a family vector, tiny jitter)
        # and require exactly one member of each family to survive
        # while every singleton does.
        from search_engine_spark.ops.common import md5int_col
        from search_engine_spark.ops.dedup import semdedup

        from pyspark.sql.window import Window as _W

        survivors = nonempty.select("url").localCheckpoint()
        fam = (
            survivors.orderBy("url").limit(20)
            .withColumn(
                "_fid",
                (F.row_number().over(_W.orderBy("url")) % 10).cast("string"),
            )
        )
        keyed = survivors.join(fam, "url", "left").select(
            "url",
            F.coalesce(F.col("_fid"), F.col("url")).alias("_key"),
            F.col("_fid").isNotNull().alias("_planted"),
        )
        DIM = 32
        emb = keyed.select(
            "url", "_planted", "_key",
            F.array(*[
                (
                    F.sin(
                        (md5int_col(
                            F.concat(F.col("_key"), F.lit(f"|{j}"))
                        ) % 100_000).cast("double")
                    )
                    # per-URL jitter so family members are near- but
                    # not bit-identical (cos ~0.9999)
                    + 0.01 * F.sin(
                        (md5int_col(
                            F.concat(F.col("url"), F.lit(f"#{j}"))
                        ) % 100_000).cast("double")
                    )
                ).alias(f"e{j}")
                for j in range(DIM)
            ]).alias("vec"),
        ).localCheckpoint()
        n_surv = emb.count()
        # ADVICE r3: the planted-family asserts presuppose >= 20
        # survivors (10 full two-member families); an upstream-stage
        # change that cuts deeper must fail HERE with the real reason,
        # not as a puzzling family-count mismatch below
        assert n_surv >= 20, (
            f"only {n_surv} survivors reached the SemDeDup stage; "
            "the planted-family check needs >= 20"
        )
        sem = semdedup(emb, "url", "vec", n_clusters=4, threshold=0.9,
                       train_sample=128, iters=4, seed=3)
        sem_kept = {r["id"] for r in sem.select("id").collect()}
        fam_rows = fam.collect()
        by_fid = {}
        for r in fam_rows:
            by_fid.setdefault(r["_fid"], []).append(r["url"])
        # A twin pair survives whole ONLY if k-means put it in one
        # cell; a near-tie in centroid cosine can legitimately split a
        # family across cells (pairs form within clusters by design —
        # the paper's own approximation).  Tolerate at most 2 such
        # near-tie splits of 10 and require the dedup SIGNAL: most
        # families collapse to one member (ADVICE r3).
        split_fams = 0
        for fid, urls in by_fid.items():
            alive = [u for u in urls if u in sem_kept]
            assert 1 <= len(alive) <= len(urls), (
                f"family {fid}: {len(alive)}/{len(urls)} survived semdedup"
            )
            if len(alive) > 1:
                split_fams += 1
        assert split_fams <= 2, (
            f"{split_fams}/10 planted families survived whole — "
            "SemDeDup is not collapsing near-duplicates"
        )
        singles = {r["url"] for r in keyed.filter(~F.col("_planted"))
                   .select("url").collect()}
        assert singles <= sem_kept, "semdedup dropped a singleton"
        counts["semantic_dedup"] = len(sem_kept)
        # exact bookkeeping given the per-family outcomes above
        n_fam_alive = sum(
            len([u for u in urls if u in sem_kept])
            for urls in by_fid.values()
        )
        assert len(sem_kept) == len(singles) + n_fam_alive

        # 11) DSIR data selection (ops/dsir.py): score train-split docs
        # against the val split as the target distribution (hashed
        # unigram+bigram importance weights) and keep the top half —
        # deterministic, so two runs agree exactly.
        from search_engine_spark.ops.dsir import dsir_select

        tok_docs = assigned.select(
            "url", "_split",
            F.filter(
                F.split(F.lower("text"), r"[^a-z0-9]+"),
                lambda t: F.length(t) > 0,
            ).alias("toks"),
        ).localCheckpoint()
        n_train = tok_docs.filter(F.col("_split") == "train").count()
        k_sel = max(1, n_train // 2)
        sel_a = dsir_select(
            tok_docs.filter(F.col("_split").isin("train", "val")),
            "url", "toks", F.col("_split") == "val", k=k_sel,
        ).collect()
        sel_b = dsir_select(
            tok_docs.filter(F.col("_split").isin("train", "val")),
            "url", "toks", F.col("_split") == "val", k=k_sel,
        ).collect()
        assert [tuple(r) for r in sel_a] == [tuple(r) for r in sel_b]
        train_urls = {r["url"] for r in tok_docs
                      .filter(F.col("_split") == "train")
                      .select("url").collect()}
        assert {r["id"] for r in sel_a} <= train_urls, (
            "DSIR selected a target (val) doc")
        counts["dsir_selected"] = len(sel_a)

        print(json.dumps({
            "funnel": counts,
            "splits": splits,
            "kept_pct": round(100.0 * counts["span_dedup"] / counts["input"], 2),
            "mixed_docs": n_mixed,
            "pack_stats": pstats,
            "bpe": {"n_merges": len(merges),
                    "mean_tokens_per_word": round(mean_bpe, 3)},
            "total_s": round(time.time() - t0, 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
