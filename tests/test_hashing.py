import numpy as np
import pyarrow as pa

from commerce_logs_pipeline_ray.functions.hashing import (
    fnv1a32,
    fnv1a32_single,
    fnv1a64,
    fnv1a64_single,
    partition_of,
)

# Known FNV-1a vectors (public test vectors from the FNV reference)
KNOWN_32 = {"": 0x811C9DC5, "a": 0xE40C292C, "foobar": 0xBF9CF968}
KNOWN_64 = {"": 0xCBF29CE484222325, "a": 0xAF63DC4C8601EC8C, "foobar": 0x85944171F73967E8}


def test_fnv32_known_vectors():
    for s, expect in KNOWN_32.items():
        assert fnv1a32_single(s) == expect
    got = fnv1a32(pa.array(list(KNOWN_32.keys())))
    assert got.tolist() == [v for v in KNOWN_32.values()]


def test_fnv64_known_vectors():
    for s, expect in KNOWN_64.items():
        assert fnv1a64_single(s) == expect
    got = fnv1a64(list(KNOWN_64.keys()))
    assert [int(x) for x in got] == list(KNOWN_64.values())


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(7)
    strs = ["".join(chr(rng.integers(97, 123)) for _ in range(rng.integers(0, 40))) for _ in range(200)]
    vec = fnv1a32(pa.chunked_array([pa.array(strs[:100]), pa.array(strs[100:])]))
    assert vec.tolist() == [fnv1a32_single(s) for s in strs]


def test_partition_of_matches_reference_semantics():
    # FNV32a(key) % 12 — processor.go:29-33
    keys = ["blob-a", "blob-b", ""]
    assert partition_of(keys, 12).tolist() == [fnv1a32_single(k) % 12 for k in keys]


def test_nulls_treated_as_empty():
    arr = pa.array(["x", None, ""])
    got = fnv1a32(arr)
    assert got[1] == got[2] == fnv1a32_single("")


def test_fnv_unicode_multibyte():
    strs = ["héllo", "日本語テキスト", "emoji🙂mix", ""]
    vec = fnv1a32(pa.array(strs))
    assert vec.tolist() == [fnv1a32_single(s) for s in strs]
    vec64 = fnv1a64(strs)
    from commerce_logs_pipeline_ray.functions.hashing import fnv1a64_single
    assert [int(x) for x in vec64] == [fnv1a64_single(s) for s in strs]
