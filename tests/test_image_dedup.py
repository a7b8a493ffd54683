"""Image average-hash dedup (functions/multimodal.py:average_hash /
image_ahash / image_near_dup_pairs): hash semantics on controlled
images, perturbation tolerance, cross-cluster separation, the generic
banding refactor's equivalence, and the registry row."""

from __future__ import annotations

import numpy as np

from simpy__kafka__flink__kafka_spark.functions.multimodal import (
    average_hash, encode_ppm, image_ahash, image_near_dup_pairs)


def _img(pattern: np.ndarray) -> np.ndarray:
    """Expand an 8x8 0/1 pattern into a 32x32 RGB image (black/white)."""
    big = np.kron(pattern, np.ones((4, 4), dtype=np.uint8)) * 255
    return np.stack([big] * 3, axis=-1)


def test_average_hash_semantics():
    half = np.zeros((8, 8), dtype=np.uint8)
    half[:, 4:] = 1                       # right half bright
    h = average_hash(_img(half))
    # exactly the bright cells are set: row-major MSB-first
    expect = int("".join("1" if half[r, c] else "0"
                         for r in range(8) for c in range(8)), 2)
    expect = expect - (1 << 64) if expect >= (1 << 63) else expect
    assert h == expect
    # shifting one column flips exactly 8 grid cells -> hamming 8
    shifted = np.zeros_like(half)
    shifted[:, 3:] = 1
    assert bin((average_hash(_img(half)) ^ average_hash(_img(shifted)))
               & ((1 << 64) - 1)).count("1") == 8
    # inversion flips every bit
    assert bin((average_hash(_img(half)) ^ average_hash(_img(1 - half)))
               & ((1 << 64) - 1)).count("1") == 64


def test_near_dup_pairs_cluster_and_separate(spark):
    base = np.zeros((8, 8), dtype=np.uint8)
    base[2:6, 2:6] = 1                    # centered square
    near = base.copy()
    near[2, 2] = 0                        # one grid cell off -> hamming 1
    far = 1 - base                        # inverted -> hamming 64
    rows = [(1, bytearray(encode_ppm(_img(base)))),
            (2, bytearray(encode_ppm(_img(base)))),   # exact dup of 1
            (3, bytearray(encode_ppm(_img(near)))),   # near dup
            (4, bytearray(encode_ppm(_img(far))))]    # far
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    sig = {r.doc_id: r.ahash for r in image_ahash(media).collect()}
    assert sig[1] == sig[2]
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in image_near_dup_pairs(media, max_hamming=5).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert all(4 not in p for p in pairs), pairs


def test_registry_row_groups_pair(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["image_near_dup"]
    assert q.oracle is not None  # oracled end to end since round 8
    rows = q.build(spark, sf_dir).collect()
    assert rows
    # every pair's members belong to the same synthesized raster group
    assert all(r.doc_a % 25 == r.doc_b % 25 for r in rows)
    # exact-duplicate group members pair at hamming 0
    assert any(r.hamming == 0 for r in rows)


def test_image_ahash_oracle_row(spark, sf_dir):
    # the real-decoder row must agree with the pure-arithmetic oracle
    # (gate-checked at sf0.01; here pinned at sf0.001 alongside a direct
    # re-derivation of one doc's hash from the synthesized raster)
    from tests.oracle_utils import normalize, run_oracle

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["image_ahash_oracle"]
    assert q.oracle is not None
    sp = q.build(spark, sf_dir).toPandas()
    assert normalize(sp) == normalize(run_oracle(q.oracle, sf_dir))
    # independent pure-python re-derivation for doc 1 (doc 0 is in the
    # perturbed doc_id % 5 == 0 branch; doc 1 uses the plain group raster)
    import hashlib

    base = "".join(hashlib.md5(f"img{k}:1".encode()).hexdigest()
                   for k in range(6))
    grays = [(ord(base[3 * p]) + ord(base[3 * p + 1])
              + ord(base[3 * p + 2])) // 3 for p in range(64)]
    mean = sum(grays) // 64
    bits = "".join("1" if g >= mean else "0" for g in grays)
    want = f"{int(bits, 2):016x}"
    got = sp.set_index("doc_id").loc[1, "ahash_hex"]
    assert got == want


def test_image_near_dup_oracled_and_sig_df_shared(spark, sf_dir):
    # round 8: the PAIRS row is oracled end to end (not just the hash),
    # and a precomputed sig_df short-circuits the decode scan with an
    # identical result set
    from tests.oracle_utils import normalize, run_oracle

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        image_ahash, image_near_dup_pairs)
    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["image_near_dup"]
    assert q.oracle is not None
    sp = q.build(spark, sf_dir).toPandas()
    assert normalize(sp) == normalize(run_oracle(q.oracle, sf_dir))

    # sig_df sharing: pairs from a precomputed signature frame are
    # identical to the self-computed path (and skip the decode entirely —
    # media content is never read when sig_df is passed)
    import pandas as pd

    media = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "content": [b"P6\n1 1\n255\n\x00\x00\x00",
                    b"P6\n1 1\n255\n\x00\x00\x00",
                    b"P6\n1 1\n255\n\xff\xff\xff"]}))
    sig = image_ahash(media)
    direct = image_near_dup_pairs(media, max_hamming=5).collect()
    shared = image_near_dup_pairs(media, max_hamming=5, sig_df=sig).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, shared))


def test_diff_hash_brightness_and_contrast_invariant():
    import numpy as np

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        diff_hash)

    rng = np.random.default_rng(7)
    px = rng.integers(10, 100, size=(16, 16, 3), dtype=np.int64)
    h = diff_hash(px)
    assert diff_hash(px + 30) == h           # global brightness shift
    assert diff_hash(px * 2) == h            # positive contrast scale
    # a genuine content change flips bits
    other = px.copy()
    other[:8, :8, :] = 255 - other[:8, :8, :]
    assert diff_hash(other) != h


def test_diff_hash_matches_independent_bit_derivation():
    import numpy as np

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        diff_hash)

    # 8x8 grayscale ramp: independent hand derivation of the packed bits
    gray = np.arange(64, dtype=np.int64).reshape(8, 8)
    px = np.stack([gray, gray, gray], axis=-1)
    # resample 8 -> 9 cols duplicates col 0: first pair equal (bit 0),
    # all remaining 7 pairs strictly increasing (bit 1) in every row
    expect_bits = "01111111" * 8
    v = int(expect_bits, 2)
    expect = v - (1 << 64) if v >= (1 << 63) else v
    assert diff_hash(px) == expect


def test_image_dhash_oracle_row(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["image_dhash_oracle"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "image_dhash_oracle")


def test_hashes_reject_non_64bit_grid():
    import numpy as np
    import pytest

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        average_hash, diff_hash)

    px = np.zeros((8, 8, 3), np.int64)
    for fn in (average_hash, diff_hash):
        with pytest.raises(ValueError):
            fn(px, grid=9)
