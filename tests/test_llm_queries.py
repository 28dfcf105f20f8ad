"""Oracle parity + properties for the LLM-data tier (text / dedup /
similarity / multimodal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.oracle import compare

ORACLE_CHECKED = [
    "text_quality_stats",
    "token_counting",
    "lang_id_heuristic",
    "doc_fingerprint",
    "corpus_lang_source_profile",
    "corpus_train_eval_split",
    "document_chunking",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "dedup_cc_minhash",
    "simhash_signatures",
    "similarity_topk_cosine",
    "embedding_cosine_neardup",
    "embedding_quantize_int8",
    "multimodal_features",
    "multimodal_image_decode",
    "multimodal_audio_decode",
    "text_tfidf_top_terms",
    "text_bigram_counts",
    "corpus_decontamination",
    "semantic_dedup_keeplist",
    "entity_resolution_blocked",
    "multimodal_video_framesample",
    "multimodal_image_resize",
    "multimodal_image_decode_png",
    "multimodal_image_decode_jpeg",
    "kmeans_fixed_point",
    "ngram_novelty_score",
    "corpus_domain_mixing",
    "corpus_seeded_shuffle",
    "dedup_substring_spans",
    "dedup_containment_pairs",
    "dedup_minhash_incremental",
    "embedding_random_projection",
    "text_commonness_score",
    "text_feature_hashing",
    "corpus_temperature_weights",
    "dedup_threshold_sweep",
    "text_charclass_profile",
    "dedup_containment_dfcap",
    "dedup_containment_recall_sweep",
    "multimodal_video_nal_index",
    "simhash_hamming_neardup",
    "corpus_split_neardup_safe",
    "multimodal_audio_energy_windows",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    compare(name, spark, sf_dir, entrymod.queries(), entrymod.oracle_sql())


def test_dedup_exact_finds_constructed_dups(spark, sf_dir):
    """Every exact replica group (doc_id%10==0 → +100000) must be found."""
    df = entrymod.queries()["dedup_exact"](spark, sf_dir)
    rows = df.collect()
    assert all(r.n_copies >= 2 for r in rows)
    assert len(rows) > 0


def test_minhash_recall_on_near_dups(spark, sf_dir):
    """MinHash-LSH must recover a healthy share of the exact-Jaccard pairs
    (banding is probabilistic; with 4 bands × 2 rows at j≈0.9 the per-pair
    miss probability is ~(1-0.81)^4 ≈ 0.1%)."""
    q = entrymod.queries()
    exact = {
        (r.doc_a, r.doc_b)
        for r in q["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b) for r in q["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert exact, "constructed near-dups must produce exact pairs"
    assert lsh.issubset(exact), "LSH-verified pairs must be true pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} too low"


def test_lsh_bucket_recall_on_scaled_copies(spark, sf_dir):
    """Hyperplane-LSH buckets must co-locate every ×2-scaled copy with its
    original (identical direction → identical sign code)."""
    from change_data_capture_spark.operators.similarity_queries import (
        _lsh_bucket_pairs,
    )

    df = _lsh_bucket_pairs(spark, sf_dir)
    pairs = {(r.vec_a, r.vec_b) for r in df.collect()}
    # constructed positives: (vec_id, vec_id+100000) for vec_id % 10 == 0
    from change_data_capture_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "embeddings")
    expected = {
        (r.vec_id, r.vec_id + 100000)
        for r in base.where(F.col("vec_id") % 10 == 0).select("vec_id").collect()
    }
    missing = {p for p in expected if p not in pairs}
    assert not missing, f"scaled copies missing from LSH buckets: {sorted(missing)[:5]}"


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with 4/8 probes must recover most of the exact top-10 (random
    64-d vectors: the true neighbors concentrate in the nearest lists)."""
    q = entrymod.queries()
    exact = {}
    for r in q["similarity_topk_cosine"](spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    from change_data_capture_spark.operators.similarity_queries import (
        _ivf_topk_neighbors,
    )

    ivf = {}
    for r in _ivf_topk_neighbors(spark, sf_dir).collect():
        ivf.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(ivf) == set(exact)
    recalls = [len(ivf[k] & exact[k]) / len(exact[k]) for k in exact]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, f"IVF avg recall {avg:.2f} too low"


def test_stratified_sample_exact_fractions_and_determinism(spark, sf_dir):
    """The exact-fraction stratified sample must keep EXACTLY
    floor(pct·n/100) docs per stratum (not ±noise like the old Bernoulli
    sampleBy form), be reproducible, and keep the stratum's lowest-draw
    docs (order-statistics contract, so appends can only displace — never
    reshuffle — the kept set)."""
    q = entrymod.queries()["corpus_stratified_sample"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "seeded sample not stable"

    from change_data_capture_spark.sources.tables import load_table

    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {}
    for r in a:
        got[r.lang] = got.get(r.lang, 0) + 1
    for lang, n in totals.items():
        pct = 30 if lang == "en" else 100
        assert got.get(lang, 0) == pct * n // 100, (lang, got.get(lang), n)


def test_h264_annexb_parser_unit():
    """The Annex-B NAL parser must handle both start-code lengths, classify
    NAL types from the header byte, and index IDR keyframes with byte-exact
    offsets and payload sizes (no stub remains: this replaced the old
    decode_image_real NotImplementedError)."""
    import math

    from change_data_capture_spark.operators.multimodal import parse_h264_annexb

    # SPS(2B) + PPS(1B) + IDR(3B payload) + non-IDR(2B) + IDR(4B)
    stream = (
        b"\x00\x00\x00\x01\x67\xaa\xaa"
        b"\x00\x00\x00\x01\x68\xbb"
        b"\x00\x00\x00\x01\x65\x81\x82\x83"
        b"\x00\x00\x01\x41\x90\x91"
        b"\x00\x00\x00\x01\x65\xa0\xa1\xa2\xa3"
    )
    n_nals, n_sps, n_pps, n_idr, n_nonidr, first_idr, mean_idr = (
        parse_h264_annexb(stream)
    )
    assert (n_nals, n_sps, n_pps, n_idr, n_nonidr) == (5, 1, 1, 2, 1)
    assert first_idr == 13  # 7 (SPS NAL) + 6 (PPS NAL)
    assert mean_idr == 3.5  # (3 + 4) / 2

    # no IDR → sentinel offset and NaN mean
    *_, first_idr2, mean2 = parse_h264_annexb(b"\x00\x00\x01\x41\x90")
    assert first_idr2 == -1 and math.isnan(mean2)


def test_png_codec_roundtrip_random_images():
    """encode_png→decode_png must be pixel-exact on RANDOM images (exercises
    zlib inflate + all five un-filters with adversarial content, not just
    the banded fixture shapes); the encoder must actually emit all five
    scanline filter types."""
    import zlib

    import numpy as np

    from change_data_capture_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(42)
    for shape in [(1, 1), (5, 3), (8, 13), (7, 7)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        w, h, mr, mg, mb = decode_png(encode_png(img))
        means = img.reshape(-1, 3).astype(float).mean(axis=0)
        assert (w, h) == (shape[1], shape[0])
        assert abs(mr - means[0]) < 1e-12
        assert abs(mg - means[1]) < 1e-12
        assert abs(mb - means[2]) < 1e-12
    # filter coverage: a >=5-row image carries filter bytes 0..4
    img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    payload = encode_png(img)
    idat_off = payload.index(b"IDAT") + 4
    (ln,) = __import__("struct").unpack(">I", payload[idat_off - 8 : idat_off - 4])
    raw = zlib.decompress(payload[idat_off : idat_off + ln])
    stride = 4 * 3 + 1
    filters = {raw[r * stride] for r in range(6)}
    assert filters == {0, 1, 2, 3, 4}


def test_png_decode_rejects_corruption():
    """CRC verification must catch bit flips in the compressed stream."""
    import numpy as np

    from change_data_capture_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    payload = bytearray(encode_png(np.zeros((3, 3, 3), dtype=np.uint8)))
    payload[len(payload) - 20] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_connected_components_properties(spark, sf_dir):
    """Every near-dup pair's endpoints share a component; the component id
    is the minimum doc_id of its members; sizes are consistent."""
    q = entrymod.queries()
    comp = {r.doc_id: r.component_id
            for r in q["dedup_connected_components"](spark, sf_dir).collect()}
    pairs = q["dedup_ngram_jaccard"](spark, sf_dir).collect()
    assert all(comp[r.doc_a] == comp[r.doc_b] for r in pairs)
    by_comp = {}
    for d, c in comp.items():
        by_comp.setdefault(c, []).append(d)
    assert all(c == min(members) for c, members in by_comp.items())


def test_quantization_bounds(spark, sf_dir):
    """int8 codes must stay in [-127, 127] and reconstruction error is
    bounded by half a quantization step (scale/254) per element."""
    rows = entrymod.queries()["embedding_quantize_int8"](spark, sf_dir).collect()
    assert rows and all(-127 <= r.q_min <= r.q_max <= 127 for r in rows)
    assert all(r.scale > 0 for r in rows)


def test_neardup_banded_matches_allpairs(spark, sf_dir):
    """Ground-truth fixture: the quadratic all-pairs scan (kept ONLY here)
    must agree with the banded-LSH query — i.e. banding loses no pair on
    this corpus (scaled copies collide in every band)."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.operators.similarity_queries import cosine
    from change_data_capture_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scaled = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x * 2).alias("v"),
    )
    vecs = e.unionAll(scaled)
    a = vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    allpairs = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("c"))
        .where(F.col("c") >= 0.99)
        .collect()
    }
    banded = {
        (r.vec_a, r.vec_b)
        for r in entrymod.queries()["embedding_cosine_neardup"](
            spark, sf_dir
        ).collect()
    }
    assert banded == allpairs


def test_wav_payloads_parse_with_stdlib_wave(spark, sf_dir):
    """The Spark-assembled RIFF bytes must be REAL wave files: the stdlib
    `wave` reader (independent of our decoder) must parse them and agree on
    rate / width / frame count / content."""
    import io
    import struct
    import wave

    from change_data_capture_spark.operators.multimodal import wav_payloads

    rows = wav_payloads(spark, sf_dir).limit(20).collect()
    assert rows
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.payload))) as wf:
            assert wf.getframerate() == 16000
            assert wf.getsampwidth() == 2
            assert wf.getnchannels() == 1
            n = wf.getnframes()
            assert n == 64 + r.vec_id % 64
            frames = wf.readframes(n)
        amp = r.vec_id % 200 - 100
        assert struct.unpack(f"<{n}h", frames) == (amp,) * n


def test_ppm_payloads_decode_roundtrip(spark, sf_dir):
    """Pixel-level check of one Spark-assembled PPM against a hand-built
    reference file for the same doc_id."""
    from change_data_capture_spark.operators.multimodal import (
        decode_ppm,
        ppm_payloads,
    )

    r = ppm_payloads(spark, sf_dir).orderBy("doc_id").limit(3).collect()[-1]
    w, h = 8 + r.doc_id % 9, 4 + r.doc_id % 7
    rgb = bytes([r.doc_id % 256, (r.doc_id * 31 + 7) % 256, (r.doc_id * 97 + 13) % 256])
    expect = f"P6\n{w} {h}\n255\n".encode() + rgb * (w * h)
    assert bytes(r.payload) == expect
    assert decode_ppm(expect)[:2] == (w, h)


def test_decontamination_flags_injected_overlap(spark, tmp_path):
    """Constructed-positive check (independent of the oracle): a 13-gram
    copied from a train doc into an eval doc must be flagged; an eval doc
    with no 13-token overlap must not. doc_ids 0-4 hash into the train
    bucket and 8/21 into eval under the seeded split (precomputed)."""
    shared = " ".join(f"w{i}" for i in range(13))  # the leaked 13-gram
    other = " ".join(f"x{i}" for i in range(13))
    docs = spark.createDataFrame(
        [
            (0, f"intro {shared} outro", "en", "web", 1),
            (1, f"{other} tail piece", "en", "web", 1),
            (8, f"prefix {shared} suffix words", "en", "web", 1),  # leaked
            (21, " ".join(f"y{i}" for i in range(20)), "en", "web", 1),  # clean
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["n_train_docs"])
        for r in entrymod.queries()["corpus_decontamination"](spark, sf).collect()
    }
    assert 8 in out and out[8] == (1, 1), out
    assert 21 not in out


def test_substring_spans_replicas_fully_duplicated(spark, sf_dir):
    """Exact replicas (doc_id%10==0 → +100000) share every 8-token window
    with their original → dup_fraction must be exactly 1.0 on both rows."""
    df = entrymod.queries()["dedup_substring_spans"](spark, sf_dir)
    reps = df.where(F.col("doc_id") >= 100000).where(F.col("doc_id") < 200000)
    rows = reps.collect()
    assert rows, "no replica rows reported"
    assert all(r.dup_fraction == 1.0 for r in rows)
    # and a clean original (not a replica source, not a mutation source)
    clean = df.where(
        (F.col("doc_id") < 100000)
        & (F.col("doc_id") % 10 != 0)
        & (F.col("doc_id") % 7 != 0)
    ).collect()
    assert all(r.n_dup_windows <= r.n_windows for r in clean)


def test_containment_catches_append_mutants(spark, sf_dir):
    """The append-mutated near-dups (+200000, text + ' qq zz') fully contain
    their original's shingle set → containment 1.0 with the original as the
    inner (smaller) doc."""
    df = entrymod.queries()["dedup_containment_pairs"](spark, sf_dir)
    pairs = {(r.doc_inner, r.doc_outer): r.containment for r in df.collect()}
    hits = [
        c
        for (inner, outer), c in pairs.items()
        if outer == inner + 200000
    ]
    assert hits, "no (original, mutant) containment pair found"
    assert all(c == 1.0 for c in hits)


def test_charclass_partition_is_exhaustive(spark, sf_dir):
    """Char classes partition the document: counts must sum to n_chars."""
    df = entrymod.queries()["text_charclass_profile"](spark, sf_dir)
    bad = df.where(
        F.col("n_alpha")
        + F.col("n_digit")
        + F.col("n_space")
        + F.col("n_nonascii")
        + F.col("n_other_ascii")
        != F.col("n_chars")
    ).count()
    assert bad == 0


def test_incremental_minhash_equals_full_recompute_slice(spark, sf_dir):
    """The incremental (delta-vs-corpus) answer must be exactly the full
    MinHash-LSH answer restricted to pairs touching a delta doc — banding
    is deterministic, so incremental maintenance loses nothing."""
    q = entrymod.queries()
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in q["dedup_minhash_lsh"](spark, sf_dir).collect()
        if r.doc_a % 3 == 0 or r.doc_b % 3 == 0
    }
    incr = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in q["dedup_minhash_incremental"](spark, sf_dir).collect()
    }
    assert incr == full


def test_random_projection_preserves_norms_on_average(spark, sf_dir):
    """JL with a ±1/√k matrix is an unbiased norm estimator: per-vector
    ||y||²/||x||² is noisy at k=8 (rel-std ≈ 0.5), but the corpus mean must
    concentrate near 1 (CLT: std ≈ 0.5/√500 ≈ 0.022)."""
    from change_data_capture_spark.sources.tables import load_table

    df = entrymod.queries()["embedding_random_projection"](spark, sf_dir)
    ny = sum(F.col(f"y{j}") * F.col(f"y{j}") for j in range(8))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("nx"),
    )
    j = df.select("vec_id", ny.alias("ny")).join(emb, "vec_id").where(F.col("nx") > 0)
    row = j.agg(F.avg(F.col("ny") / F.col("nx")).alias("r")).collect()[0]
    assert 0.85 <= row.r <= 1.15, row.r


def test_temperature_weights_sum_to_one(spark, sf_dir):
    """Mixture weights are a distribution and small sources are up-weighted
    relative to their raw share (the point of alpha < 1)."""
    rows = entrymod.queries()["corpus_temperature_weights"](spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-12
    tot_tok = sum(r.n_tokens for r in rows)
    smallest = min(rows, key=lambda r: r.n_tokens)
    assert smallest.weight > smallest.n_tokens / tot_tok


def test_feature_hashing_bounds(spark, sf_dir):
    """Per-doc |f_j| can never exceed the doc's token count, and the vector
    is non-trivial for non-empty docs."""
    df = entrymod.queries()["text_feature_hashing"](spark, sf_dir)
    q = entrymod.queries()["token_counting"](spark, sf_dir).select(
        "doc_id", "n_ws_tokens"
    )
    j = df.join(q, "doc_id")
    cond = None
    for k in range(16):
        c = F.abs(F.col(f"f{k}")) > F.col("n_ws_tokens")
        cond = c if cond is None else (cond | c)
    assert j.where(cond).count() == 0


def test_threshold_sweep_recall_monotone_and_consistent(spark, sf_dir):
    """Candidate recall rises (weakly) with the threshold and the 0.6 row
    agrees with the verified LSH pipeline's own pair count."""
    rows = {
        r.threshold: r
        for r in entrymod.queries()["dedup_threshold_sweep"](spark, sf_dir).collect()
    }
    ts = sorted(rows)
    recalls = [rows[t].recall for t in ts if rows[t].recall is not None]
    assert all(b >= a - 1e-12 for a, b in zip(recalls, recalls[1:])), recalls
    lsh_pairs = entrymod.queries()["dedup_minhash_lsh"](spark, sf_dir).count()
    assert rows[0.6].n_lsh_caught == lsh_pairs


def test_containment_dfcap_recall_against_exact(spark, sf_dir):
    """The df-capped containment variant must be a SUBSET of the exact
    pairs (verification is exact, so no false positives) and the measured
    recall curve must be monotone in the cap and >= 0.95 at the shipped
    DF_CAP operating point (VERDICT r3 ask #6's target)."""
    from change_data_capture_spark.operators.dedup_queries import DF_CAP

    q = entrymod.queries()
    exact = {
        (r.doc_inner, r.doc_outer)
        for r in q["dedup_containment_pairs"](spark, sf_dir).collect()
    }
    capped = {
        (r.doc_inner, r.doc_outer)
        for r in q["dedup_containment_dfcap"](spark, sf_dir).collect()
    }
    assert exact, "fixture must produce containment pairs"
    assert capped.issubset(exact)
    sweep = {
        r.df_cap: r.recall
        for r in q["dedup_containment_recall_sweep"](spark, sf_dir).collect()
    }
    caps = sorted(sweep)
    assert all(sweep[a] <= sweep[b] for a, b in zip(caps, caps[1:])), (
        "recall must be monotone in the df cap"
    )
    assert sweep[DF_CAP] >= 0.95, f"recall at DF_CAP={DF_CAP}: {sweep[DF_CAP]}"
    assert len(capped) / len(exact) >= 0.95


def test_simhash_hamming_neardup_catches_replicas(spark, sf_dir):
    """Every exact replica pair (doc_id%10==0 → +100000, identical text →
    identical signature) must surface at hamming 0; appended-suffix mutants
    (+200000, two extra tokens) must surface within the distance budget —
    the banding is lossless for d ≤ bands−1 so this is a guarantee, not a
    recall target. No pair may exceed the threshold."""
    from change_data_capture_spark.operators.dedup_queries import _HAM_MAX, corpus

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in entrymod.queries()["simhash_hamming_neardup"](spark, sf_dir).collect()
    }
    assert got, "fixture replicas must produce pairs"
    assert all(0 <= h <= _HAM_MAX for h in got.values())
    all_ids = {
        r.doc_id for r in corpus(spark, sf_dir).select("doc_id").collect()
    }
    exact_pairs = [
        (d, d + 100000)
        for d in all_ids
        if d < 100000 and d % 10 == 0 and d + 100000 in all_ids
    ]
    assert exact_pairs
    for a, b in exact_pairs:
        assert got.get((a, b)) == 0, f"replica pair {(a, b)} missing or nonzero"


def test_simhash_hamming_neardup_plan_is_bucketed(spark, sf_dir):
    """Candidate generation must be the band equi-join — never all-pairs."""
    from change_data_capture_spark.plans import plan_stats

    s = plan_stats(entrymod.queries()["simhash_hamming_neardup"](spark, sf_dir))
    assert not s.has_cartesian and not s.has_bnlj, s.text


def test_neardup_safe_split_zero_leakage_and_singleton_stability(spark, sf_dir):
    """The cluster-rep split must put every LSH-verified near-dup pair on
    ONE side (zero cross-split leakage by construction), while singleton
    docs keep exactly the plain content-hash split's assignment — and the
    fixture must demonstrate the problem: the plain split DOES leak."""
    import hashlib

    q = entrymod.queries()
    split = {
        r.doc_id: r.split
        for r in q["corpus_split_neardup_safe"](spark, sf_dir).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in q["dedup_minhash_lsh"](spark, sf_dir).select("doc_a", "doc_b").collect()
    ]
    assert pairs
    assert not [p for p in pairs if split[p[0]] != split[p[1]]], "leakage!"

    def plain(d):
        h = int(hashlib.md5(f"split|{d}".encode()).hexdigest()[:15], 16)
        return "train" if h % 100 < 90 else "eval"

    # the reason this operator exists: the naive split straddles clusters
    assert any(plain(a) != plain(b) for a, b in pairs), (
        "fixture no longer demonstrates plain-split leakage — rework it"
    )
    clustered = {d for p in pairs for d in p}
    singles = [d for d in split if d not in clustered]
    assert singles
    assert all(split[d] == plain(d) for d in singles)


def test_energy_window_payloads_parse_with_stdlib_wave(spark, sf_dir):
    """The windowed-energy WAVs must also be REAL wave files per the stdlib
    reader, with the per-window amplitude staircase present sample-exact —
    and the query must emit silence windows (rms 0) when the staircase
    crosses zero, proving the DSP pass doesn't special-case them."""
    import io
    import struct
    import wave

    from change_data_capture_spark.operators.multimodal import (
        _ENERGY_WIN,
        multimodal_audio_energy_windows,
    )

    q = multimodal_audio_energy_windows(spark, sf_dir)
    rows = q.collect()
    assert rows
    assert any(r.rms == 0.0 and r.peak_amp == 0 for r in rows), (
        "staircase must produce at least one silence window"
    )
    for r in rows:
        assert abs(r.rms - abs((r.vec_id + r.window_idx) % 200 - 100)) < 1e-12

    # independent byte-level validation: the decoder must agree with the
    # stdlib `wave` reader on a hand-assembled staircase twin
    from change_data_capture_spark.operators import multimodal as mm

    vec_id = 7
    n_win = vec_id % 3 + 2
    amps = [(vec_id + w) % 200 - 100 for w in range(n_win)]
    data = b"".join(
        struct.pack("<h", a) * _ENERGY_WIN for a in amps
    )
    hdr = (
        b"RIFF" + (len(data) + 36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        + b"data" + len(data).to_bytes(4, "little")
    )
    with wave.open(io.BytesIO(hdr + data)) as wf:
        assert wf.getnframes() == n_win * _ENERGY_WIN
    got = mm.wav_windowed_energy(hdr + data)
    assert got == [(w, float(abs(a)), abs(a)) for w, a in enumerate(amps)]
