"""Round-trip and structural tests for the self-contained CDF reader/writer."""

import numpy as np
import pytest

from configurable_spectrograms_tpu.data.cdf import CDF, CDFError, write_cdf


@pytest.fixture(scope="module")
def sample_vars():
    rng = np.random.default_rng(7)
    T, A, E = 23, 8, 12
    return {
        "time_unix": np.linspace(9.4e8, 9.4e8 + 300, T),
        "data": rng.normal(size=(T, A, E)).astype(np.float32),
        "energy": np.tile(np.geomspace(30000, 4, E).astype(np.float32), (T, A, 1)),
        "pitch_angle": np.tile(np.linspace(0, 360, A, endpoint=False).astype(np.float32)[None, :, None], (T, 1, E)),
        "counts_int": rng.integers(0, 1000, size=(T, E)).astype(np.int32),
        "flags_u2": rng.integers(0, 60000, size=(T,)).astype(np.uint16),
    }


@pytest.mark.parametrize("compress", ["none", "gzip", "file"])
def test_roundtrip(tmp_path, sample_vars, compress):
    path = str(tmp_path / f"rt_{compress}.cdf")
    write_cdf(path, sample_vars, global_attrs={"Project": "FAST", "Rev": np.int32(3)}, compress=compress)
    with CDF(path) as c:
        for name, expected in sample_vars.items():
            got = c.varget(name)
            assert got.shape == expected.shape
            assert got.dtype == expected.dtype.newbyteorder("=")
            np.testing.assert_array_equal(got, expected)
        assert c.globalattsget() == {"Project": "FAST", "Rev": 3}
        assert set(c.cdf_info()["zVariables"]) == set(sample_vars)


def test_column_major_roundtrip(tmp_path, sample_vars):
    path = str(tmp_path / "cm.cdf")
    write_cdf(path, sample_vars, compress="none", row_major=False)
    with CDF(path) as c:
        for name, expected in sample_vars.items():
            np.testing.assert_array_equal(c.varget(name), expected)


def test_nan_preserved(tmp_path):
    arr = np.array([[1.0, np.nan], [np.inf, -np.inf]], dtype=np.float32)
    path = str(tmp_path / "nan.cdf")
    write_cdf(path, {"v": arr})
    with CDF(path) as c:
        got = c.varget("v")
    np.testing.assert_array_equal(np.isnan(got), np.isnan(arr))
    np.testing.assert_array_equal(got[~np.isnan(arr)], arr[~np.isnan(arr)])


def test_varinq(tmp_path, sample_vars):
    path = str(tmp_path / "inq.cdf")
    write_cdf(path, sample_vars)
    with CDF(path) as c:
        info = c.varinq("data")
    assert info["Dim_Sizes"] == [8, 12]
    assert info["Last_Rec"] == 22
    assert info["Rec_Vary"] is True


def test_not_a_cdf(tmp_path):
    path = tmp_path / "bogus.cdf"
    path.write_bytes(b"this is not a cdf file at all........")
    with pytest.raises(CDFError):
        CDF(str(path))


def test_missing_variable(tmp_path, sample_vars):
    path = str(tmp_path / "missing.cdf")
    write_cdf(path, sample_vars)
    with CDF(path) as c, pytest.raises(CDFError):
        c.varget("nope")


@pytest.mark.parametrize("compress", ["none", "gzip", "file"])
def test_v2_roundtrip(tmp_path, sample_vars, compress):
    """The legacy V2.7 layout (4-byte offsets, 64-byte names) round-trips."""
    path = str(tmp_path / f"v2_{compress}.cdf")
    write_cdf(path, sample_vars, global_attrs={"Mission": "FAST", "N": np.int32(9)},
              compress=compress, version=2)
    with CDF(path) as c:
        assert c.cdf_info()["Version"] == "2.7"
        for name, expected in sample_vars.items():
            np.testing.assert_array_equal(c.varget(name), expected)
        assert c.globalattsget() == {"Mission": "FAST", "N": 9}


def test_v2_column_major(tmp_path, sample_vars):
    path = str(tmp_path / "v2cm.cdf")
    write_cdf(path, sample_vars, row_major=False, version=2)
    with CDF(path) as c:
        for name, expected in sample_vars.items():
            np.testing.assert_array_equal(c.varget(name), expected)


def test_bad_version(tmp_path, sample_vars):
    with pytest.raises(ValueError):
        write_cdf(str(tmp_path / "x.cdf"), sample_vars, version=4)


@pytest.mark.parametrize("compress,version", [("none", 3), ("file", 3), ("gzip", 2)])
def test_checksum_roundtrip_and_validation(tmp_path, sample_vars, compress, version):
    """MD5-signed files read back clean under validate=True; a flipped data
    byte fails validation but still parses with validation off (cdflib's
    default posture, which the reference relies on)."""
    path = str(tmp_path / f"ck_{compress}_{version}.cdf")
    write_cdf(path, sample_vars, compress=compress, version=version, checksum=True)
    with CDF(path, validate=True) as c:
        assert c.cdf_info()["Checksum"] == "MD5"
        np.testing.assert_array_equal(c.varget("data"), sample_vars["data"])

    good = open(path, "rb").read()
    # A flipped signature byte: the container itself is intact, so a lenient
    # read (cdflib's default posture, which the reference relies on) still
    # parses while validation catches the mismatch.
    blob = bytearray(good)
    blob[-1] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(CDFError, match="checksum mismatch"):
        CDF(path, validate=True)
    CDF(path, validate=False)

    # A flipped content byte always fails a validating open (as a checksum
    # mismatch, or earlier as a decompression/parse error for compressed
    # containers).
    blob = bytearray(good)
    blob[-20] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(CDFError):
        CDF(path, validate=True)


def test_validate_without_checksum_is_noop(tmp_path, sample_vars):
    path = str(tmp_path / "nock.cdf")
    write_cdf(path, sample_vars)
    with CDF(path, validate=True) as c:
        assert c.cdf_info()["Checksum"] is None


def test_libdeflate_inflate_matches_gzip(rng):
    """The libdeflate fast path and the stdlib agree on every payload shape
    the CDF reader produces (empty, tiny, large, exact-size hint)."""
    import gzip

    from configurable_spectrograms_tpu.data.cdf._inflate import gzip_decompress

    for payload in (
        b"",
        b"x",
        rng.integers(0, 255, 500_000).astype(np.uint8).tobytes(),
        bytes(1_000_000),
    ):
        z = gzip.compress(payload, 6)
        assert gzip_decompress(z) == payload
        assert gzip_decompress(z, len(payload)) == payload
    # An undersized hint must not corrupt the result (falls back internally).
    payload = bytes(range(256)) * 100
    z = gzip.compress(payload, 6)
    assert gzip_decompress(z, 10) == payload
    # Corrupt streams still raise like gzip.decompress (OSError covers
    # BadGzipFile; a bare Exception would also accept e.g. a TypeError
    # from broken argument handling).
    import pytest as _pytest

    with _pytest.raises(OSError):
        gzip_decompress(b"\x1f\x8b" + b"garbagegarbagegarbage")


def test_reader_corruption_robustness(tmp_path, sample_vars, rng):
    """Truncated or bit-flipped files fail with CDFError (the error-reason
    classifier maps it to 'invalid-cdf'), never an uncontrolled exception."""
    from configurable_spectrograms_tpu.data.cdf.reader import CDFError

    path = str(tmp_path / "fuzz.cdf")
    write_cdf(path, sample_vars)
    blob = open(path, "rb").read()

    def try_open(data: bytes, name: str) -> None:
        p = str(tmp_path / name)
        with open(p, "wb") as fh:
            fh.write(data)
        try:
            with CDF(p) as c:
                for v in c.cdf_info()["zVariables"]:
                    c.varget(v)
        except CDFError:
            pass  # the contract
        # Clean parse of a corrupted-but-decodable file is also acceptable.

    # Truncations at structurally interesting byte counts.
    for frac in (0.05, 0.3, 0.6, 0.9, 0.99):
        try_open(blob[: int(len(blob) * frac)], f"trunc_{frac}.cdf")
    # Random single-byte flips (seeded; skip the 8-byte magic so the file
    # still claims to be a CDF).
    for k in range(25):
        pos = int(rng.integers(8, len(blob)))
        mutated = bytearray(blob)
        mutated[pos] ^= 0xFF
        try_open(bytes(mutated), f"flip_{k}.cdf")


def test_corrupt_trailer_size_rejected_without_giant_alloc():
    """A bit-flipped gzip trailer claiming ~4 GiB must not make the fast
    path eagerly allocate that buffer; it reroutes to zlib, which fails
    fast on the length mismatch."""
    import gzip
    import struct
    import time

    import pytest

    from configurable_spectrograms_tpu.data.cdf._inflate import gzip_decompress

    payload = b"spectrogram" * 200
    blob = bytearray(gzip.compress(payload, 6))
    blob[-4:] = struct.pack("<I", 0xFFFFFFFF)  # corrupt ISIZE only
    t0 = time.perf_counter()
    with pytest.raises(OSError):  # BadGzipFile("Incorrect length...")
        gzip_decompress(bytes(blob))
    assert time.perf_counter() - t0 < 2.0
    # An explicit absurd expected_size takes the same safe route.
    with pytest.raises(OSError):
        gzip_decompress(bytes(blob), 0xFFFFFFFF)


def test_column_major_records_not_interleaved(tmp_path):
    """Majority applies WITHIN a record; records are stored sequentially
    (CDF spec).  A whole-buffer Fortran reshape/tobytes would interleave
    the record axis across records -- pin the physical layout and the
    round trip for a multi-record multi-dim column-major variable."""
    path = str(tmp_path / "cm.cdf")
    # 2 records of (2, 3); values unique so byte sequences are unambiguous.
    arr = np.arange(12, dtype=np.int32).reshape(2, 2, 3)
    write_cdf(path, {"v": arr}, compress="none", row_major=False)

    blob = open(path, "rb").read()
    # Record r flattened column-major, records concatenated in order.
    expected = b"".join(
        arr[r].astype("<i4").flatten(order="F").tobytes() for r in range(2)
    )
    assert expected in blob, "per-record column-major payload not found"
    wrong = arr.astype("<i4").tobytes(order="F")  # whole-array interleave
    assert wrong not in blob

    with CDF(path) as c:
        assert c.cdf_info()["Majority"] == "Column_major"
        np.testing.assert_array_equal(c.varget("v"), arr)


def test_column_major_three_axis_records(tmp_path):
    """The per-record majority transform generalizes to 3-D records."""
    path = str(tmp_path / "cm3.cdf")
    arr = np.arange(2 * 2 * 3 * 4, dtype=np.float32).reshape(2, 2, 3, 4)
    write_cdf(path, {"v": arr}, compress="gzip", row_major=False)
    blob_expected = b"".join(
        arr[r].astype("<f4").flatten(order="F").tobytes() for r in range(2)
    )
    with CDF(path) as c:
        np.testing.assert_array_equal(c.varget("v"), arr)
    # Uncompressed variant pins the physical payload too.
    path2 = str(tmp_path / "cm3u.cdf")
    write_cdf(path2, {"v": arr}, compress="none", row_major=False)
    assert blob_expected in open(path2, "rb").read()
