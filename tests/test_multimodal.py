"""Multimodal container builders/parsers: real PNG/JPEG/WAV/MP4 header
parsing (byte fixtures) + the Spark-side Arrow extraction path."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qctimeseries_spark.datapipe.multimodal import (
    FMT_OVERHEAD,
    JPEG_DC_OVERHEAD,
    MP4_TIMESCALE,
    WAV_RATES,
    _decode_payload,
    attach_media,
    build_jpeg,
    build_mp4,
    build_payload,
    build_png,
    build_wav,
    decode_jpeg,
    decode_media,
    encode_jpeg_dc,
    extract_features,
    jpeg_dims,
    jpeg_qdc,
    media_fmt,
    parse_media,
    zlib_stored_overhead,
)


def test_builder_parser_roundtrip_all_formats():
    for mid in range(12):
        text = f"doc {mid} content with unicode: 中文テスト"
        payload = build_payload(mid, text)
        meta = parse_media(payload)
        fmt = media_fmt(mid)
        content = text.encode("utf-8")
        assert meta["fmt"] == fmt
        if fmt == "png":
            # IDAT is a genuine zlib stream around the content
            assert zlib.decompress(meta["content"]) == content
            assert len(payload) == len(content) + FMT_OVERHEAD[
                fmt
            ] + zlib_stored_overhead(len(content))
        elif fmt == "jpeg":
            # real entropy-coded DC-tier image: the decoder must
            # reconstruct every block's 128+qdc pixels exactly
            w, h = jpeg_dims(mid)
            assert (meta["width"], meta["height"]) == (w, h)
            dec = decode_jpeg(payload)
            assert (dec["width"], dec["height"]) == (w, h)
            px = dec["pixels"]
            assert len(px) == w * h
            bw = w // 8
            for b in range(bw * (h // 8)):
                by, bx = divmod(b, bw)
                got = px[(by * 8) * w + bx * 8]
                assert got == 128 + jpeg_qdc(mid, b)
        else:
            assert meta["content"] == content
            assert len(payload) == len(content) + FMT_OVERHEAD[fmt]
        if fmt == "png":
            assert meta["width"] == 16 + mid % 2033
            assert meta["height"] == 16 + (mid * 7) % 1777
        elif fmt == "wav":
            rate, ch = WAV_RATES[mid % 5], 1 + mid % 2
            assert meta["sample_rate"] == rate
            assert meta["duration_s"] == len(content) / (rate * ch * 2)
        elif fmt == "mp4":
            assert meta["duration_s"] == (60 + (mid * 97) % 360000) / MP4_TIMESCALE


def test_jpeg_codec_ac_coefficients_roundtrip():
    """The decoder's AC path (run/size, ZRL, EOB, sign extension) is
    real: hand-encode a block with AC coefficients using the standard
    tables and check the IDCT output against an independent float
    IDCT."""
    import math as _m

    from qctimeseries_spark.datapipe.multimodal import (
        JPEG_AC_COUNTS,
        JPEG_AC_SYMBOLS,
        JPEG_DC_COUNTS,
        JPEG_DC_SYMBOLS,
        JPEG_ZIGZAG,
        _BitWriter,
        _huff_canonical,
        _jpeg_dc_header,
    )

    dc_codes = _huff_canonical(JPEG_DC_COUNTS, JPEG_DC_SYMBOLS)
    ac_codes = _huff_canonical(JPEG_AC_COUNTS, JPEG_AC_SYMBOLS)
    w = _BitWriter()

    def put(codes, sym):
        c, ln = codes[sym]
        w.write(c, ln)

    def put_mag(v):
        s = abs(v).bit_length()
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        return s

    # block: DC diff +3; AC: zigzag k=1 -> +2, 17 zeros (ZRL + run 1),
    # zigzag k=19 -> -4, EOB
    put(dc_codes, 2); put_mag(3)
    put(ac_codes, 0x02); put_mag(2)          # run 0, size 2
    put(ac_codes, 0xF0)                      # ZRL: 16 zeros
    put(ac_codes, 0x13); put_mag(-4)         # run 1, size 3
    put(ac_codes, 0x00)                      # EOB
    payload = _jpeg_dc_header(8, 8) + w.finish() + b"\xff\xd9"

    dec = decode_jpeg(payload)
    got = list(dec["pixels"])

    # independent reference IDCT over the dequantized coefficients
    F = [0.0] * 64
    F[JPEG_ZIGZAG[0]] = 3 * 8
    F[JPEG_ZIGZAG[1]] = 2 * 8
    F[JPEG_ZIGZAG[19]] = -4 * 8
    want = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / _m.sqrt(2) if u == 0 else 1.0
                    cv = 1 / _m.sqrt(2) if v == 0 else 1.0
                    s += (
                        0.25 * cu * cv * F[v * 8 + u]
                        * _m.cos((2 * x + 1) * u * _m.pi / 16)
                        * _m.cos((2 * y + 1) * v * _m.pi / 16)
                    )
            want.append(max(0, min(255, int(_m.floor(s + 128.5)))))
    assert got == want
    assert len(set(got)) > 1  # genuinely non-uniform block


def test_encode_jpeg_dc_validates_inputs():
    with pytest.raises(ValueError, match="multiple-of-8"):
        encode_jpeg_dc(12, 8, [0, 0])
    with pytest.raises(ValueError, match="DC values"):
        encode_jpeg_dc(16, 8, [0])
    with pytest.raises(ValueError, match="quantized DC"):
        encode_jpeg_dc(8, 8, [99])
    assert len(encode_jpeg_dc(8, 8, [-5])) == JPEG_DC_OVERHEAD + 2


def test_parse_png_idat_inflates_with_any_zlib_encoder():
    # the parser must accept IDAT from a normal compressor too, not
    # just our stored-block builder — splice a zlib.compress stream in
    scanline = b"\x00" + b"\x10\x20\x30" * 2
    built = build_png(2, 1, scanline)
    meta = parse_media(built)
    assert (meta["width"], meta["height"]) == (2, 1)
    assert zlib.decompress(meta["content"]) == scanline
    assert _decode_payload(meta["content"], "png") == list(scanline)
    # and a genuinely-compressed stream decodes identically
    assert _decode_payload(zlib.compress(scanline), "png") == list(scanline)


def test_decode_payload_wav_pcm16_signed():
    import struct as _s

    samples = [0, 1, -1, 32767, -32768, 12345]
    content = _s.pack(f"<{len(samples)}h", *samples)
    assert _decode_payload(content, "wav") == samples
    # trailing ragged byte is dropped
    assert _decode_payload(content + b"\x7f", "wav") == samples


def test_decode_payload_gated_formats_raise():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"entropy", "jpeg")
    with pytest.raises(NotImplementedError):
        _decode_payload(b"mdat", "mp4")
    with pytest.raises(ValueError):
        _decode_payload(b"not zlib at all", "png")


def test_parse_jpeg_skips_app0_segment():
    jf = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(jf)) + jf
    base = build_jpeg(40, 30, b"entropy")
    meta = parse_media(base[:2] + app0 + base[2:])
    assert (meta["width"], meta["height"]) == (40, 30)
    assert meta["content"] == b"entropy"


def test_jpeg_rejects_0xff_content():
    with pytest.raises(ValueError, match="0xFF"):
        build_jpeg(8, 8, b"\xff\xd9")


def test_parse_wav_with_padded_extra_chunk():
    wav = build_wav(16000, 1, b"pcmpcm")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size + pad
    patched = wav[:36] + extra + wav[36:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    meta = parse_media(patched)
    assert meta["sample_rate"] == 16000
    assert meta["content"] == b"pcmpcm"


def test_parse_mp4_mvhd_version1():
    mvhd1 = (
        struct.pack(">I", 0x01000000)
        + struct.pack(">QQIQ", 0, 0, 1000, 2500)
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd1)) + b"mvhd" + mvhd1
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 512)
    mdat = struct.pack(">I", 8 + 3) + b"mdat" + b"xyz"
    meta = parse_media(ftyp + moov + mdat)
    assert meta["duration_s"] == 2.5
    assert meta["content"] == b"xyz"


@pytest.mark.parametrize(
    "bad", [b"", b"garbage here", build_payload(0, "some text")[:20]]
)
def test_parse_rejects_corrupt(bad):
    with pytest.raises(ValueError):
        parse_media(bad)


DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def test_extract_features_header_derived(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(12)], DOC_SCHEMA
    )
    media = attach_media(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    # Catalyst-computed n_bytes must equal the actual payload length
    for mid, r in rows.items():
        assert r["n_bytes"] == len(r["payload"])
        assert r["fmt"] == media_fmt(mid)
    feats = {r["media_id"]: r for r in extract_features(media, dim=8).collect()}
    assert len(feats) == 12
    for mid, r in feats.items():
        assert r["valid"] is True
        assert r["fmt"] == media_fmt(mid)
        assert len(r["features"]) == 8
        if r["fmt"] == "png":
            assert r["width"] == 16 + mid % 2033
            assert r["height"] == 16 + (mid * 7) % 1777
            assert r["duration_s"] is None
        elif r["fmt"] == "jpeg":
            assert (r["width"], r["height"]) == jpeg_dims(mid)
            assert r["duration_s"] is None
        elif r["fmt"] == "wav":
            assert r["sample_rate"] == WAV_RATES[mid % 5]
            assert r["duration_s"] > 0
        else:
            assert r["duration_s"] > 0
            assert r["width"] is None


def test_decode_media_stats_match_python(spark):
    import math

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(12)], DOC_SCHEMA
    )
    out = {
        r["media_id"]: r
        for r in decode_media(attach_media(docs)).collect()
    }
    assert len(out) == 12
    for mid, r in out.items():
        fmt = media_fmt(mid)
        content = f"document number {mid} body text".encode()
        assert r["fmt"] == fmt
        if fmt == "png":
            assert r["decoded"] is True
            assert r["n_units"] == len(content)
            assert r["sum_units"] == sum(content)
            assert r["mean_unit"] == sum(content) / len(content)
            assert r["rms_unit"] == math.sqrt(
                sum(b * b for b in content) / len(content)
            )
        elif fmt == "wav":
            import struct as _s

            n = len(content) // 2
            samples = _s.unpack(f"<{n}h", content[: 2 * n])
            assert r["decoded"] is True
            assert r["n_units"] == n
            assert r["sum_units"] == sum(samples)
        elif fmt == "jpeg":  # real entropy decode + IDCT
            w, h = jpeg_dims(mid)
            nb = (w // 8) * (h // 8)
            assert r["decoded"] is True
            assert r["n_units"] == w * h
            assert r["sum_units"] == sum(
                64 * (128 + jpeg_qdc(mid, b)) for b in range(nb)
            )
        else:  # mp4: REAL stbl demux to big-endian twos-PCM16 samples
            import struct as _s

            n = len(content) // 2
            samples = _s.unpack(f">{n}h", content[: 2 * n])
            assert r["decoded"] is True
            assert r["n_units"] == n
            assert r["sum_units"] == sum(samples)
            assert r["mean_unit"] == sum(samples) / n


def test_extract_features_corrupt_payload_is_flagged_not_fatal(spark):
    media = spark.createDataFrame(
        [
            (1, "image", "png", 9, bytearray(b"not a png")),
            (4, "audio", "wav", int(len(build_payload(4, "ok"))), bytearray(build_payload(4, "ok"))),
        ],
        "media_id long, modality string, fmt string, n_bytes long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_features(media, dim=4).collect()}
    assert out[1]["valid"] is False
    assert out[1]["width"] is None and out[1]["duration_s"] is None
    assert len(out[1]["features"]) == 4  # fallback features over raw bytes
    assert out[4]["valid"] is True
    assert out[4]["sample_rate"] == WAV_RATES[4]


def test_null_payload_is_invalid_not_fatal(spark):
    # at scale some blob fetches FAIL and land as NULL; one NULL must
    # not kill a 1000-executor stage in either media operator
    media = spark.createDataFrame(
        [
            (1, "image", "png", 0, None),
            (6, "image", "png", int(len(build_payload(6, "ok"))),
             bytearray(build_payload(6, "ok"))),
        ],
        "media_id long, modality string, fmt string, n_bytes long, payload binary",
    )
    feats = {r["media_id"]: r for r in extract_features(media, dim=4).collect()}
    assert feats[1]["valid"] is False and len(feats[1]["features"]) == 4
    assert feats[6]["valid"] is True
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert dec[1]["decoded"] is False and dec[1]["n_units"] is None
    assert dec[6]["decoded"] is True


def test_decode_mp4_demuxes_sample_table_and_gates_compressed_codecs():
    """decode_mp4 trusts only what it reads back from stsd/stsz/stco —
    and the NotImplementedError gate now applies ONLY to genuinely
    compressed sample-entry codecs (e.g. AVC), not to every MP4."""
    import struct as _s

    import pytest as _pytest

    from qctimeseries_spark.datapipe.multimodal import build_mp4, decode_mp4

    content = bytes(range(200)) * 3 + b"\x81"  # odd length: mdat padding
    p = build_mp4(600, 777, content, sample_rate=44100)
    d = decode_mp4(p)
    n = len(content) // 2
    assert d["samples"] == list(_s.unpack(f">{n}h", content[: 2 * n]))
    assert d["sample_rate"] == 44100 and d["channels"] == 1
    # forge the sample-entry format to a compressed codec: gated
    forged = p.replace(b"twos", b"avc1", 1)
    with _pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4(forged)


def test_box_average_exact_semantics():
    """Floor-of-mean box averaging over a width-wrapped raster: full
    boxes, a ragged final row whose boxes average only existing bytes,
    and factor=1 as the identity."""
    from qctimeseries_spark.datapipe.multimodal import _box_average

    # 4-wide, 10 values -> 3 rows (last row ragged: 2 values)
    px = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]
    out_w, out_h, out = _box_average(px, 4, 2)
    assert (out_w, out_h) == (2, 2)
    # box(0,0)={10,20,50,60}//4=35  box(0,1)={30,40,70,80}=55
    # box(1,0)={90,100}//2=95      box(1,1)= no bytes -> 0
    assert out == [35, 55, 95, 0]
    # factor=1 keeps every byte; the ragged final row still pads to a
    # full rectangular output (empty boxes -> 0), same as the oracle
    assert _box_average(px, 4, 1) == (4, 3, px + [0, 0])
    # factor wider than the image: one box, floor of the global mean
    assert _box_average(px, 4, 100) == (1, 1, [sum(px) // len(px)])


def test_resize_media_matches_python(spark):
    """The Spark resize path equals a direct Python recompute: png over
    the wrapped document bytes, jpeg over the block-constant decoded
    raster; audio formats are resized=false."""
    from qctimeseries_spark.datapipe.multimodal import (
        _box_average,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(12)], DOC_SCHEMA
    )
    out = {
        r["media_id"]: r
        for r in resize_media(attach_media(docs), factor=2).collect()
    }
    assert len(out) == 12
    for mid, r in out.items():
        fmt = media_fmt(mid)
        assert r["fmt"] == fmt
        content = f"document number {mid} body text".encode()
        if fmt == "png":
            w = 16 + mid % 2033
            ow, oh, px = _box_average(list(content), w, 2)
            assert r["resized"] is True
            assert (r["in_w"], r["in_h"]) == (w, (len(content) + w - 1) // w)
            assert (r["out_w"], r["out_h"]) == (ow, oh)
            assert r["n_px"] == len(px)
            assert r["sum_px"] == sum(px)
        elif fmt == "jpeg":
            w, h = jpeg_dims(mid)
            nb = (w // 8) * (h // 8)
            # a 2x2 box never crosses an 8x8 block: each block yields
            # 16 output pixels equal to its decoded DC value
            assert r["resized"] is True
            assert (r["out_w"], r["out_h"]) == (w // 2, h // 2)
            assert r["n_px"] == (w // 2) * (h // 2)
            assert r["sum_px"] == sum(
                16 * (128 + jpeg_qdc(mid, b)) for b in range(nb)
            )
        else:
            assert r["resized"] is False
            assert r["n_px"] is None
    with pytest.raises(ValueError, match="factor"):
        resize_media(attach_media(docs), factor=0)


def test_sample_frames_partial_decode_matches_python(spark):
    """Every-4th-frame sampling equals the content-derived slice (wav
    little-endian, mp4 big-endian via its own stbl); images are
    sampled=false; every=1 degenerates to the full decode."""
    import struct as _s

    from qctimeseries_spark.datapipe.multimodal import sample_frames

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(12)], DOC_SCHEMA
    )
    media = attach_media(docs)
    out = {
        r["media_id"]: r for r in sample_frames(media, every=4).collect()
    }
    assert len(out) == 12
    for mid, r in out.items():
        fmt = media_fmt(mid)
        content = f"document number {mid} body text".encode()
        n = len(content) // 2
        if fmt in ("wav", "mp4"):
            order = "<" if fmt == "wav" else ">"
            allf = _s.unpack(f"{order}{n}h", content[: 2 * n])
            want = list(allf)[0::4]
            assert r["sampled"] is True
            assert r["n_frames"] == n
            assert r["n_sampled"] == len(want)
            assert r["sum_sampled"] == sum(want)
        else:
            assert r["sampled"] is False
            assert r["n_frames"] is None
    # every=1 == the full frame set
    full = {
        r["media_id"]: r for r in sample_frames(media, every=1).collect()
    }
    for mid, r in full.items():
        if r["sampled"]:
            assert r["n_sampled"] == r["n_frames"]
    with pytest.raises(ValueError, match="every"):
        sample_frames(media, every=0)


def test_media_ahash_real_decode_and_bit_rule(spark):
    """The aHash signature must equal a pure-python recompute from the
    decoded units (PNG: the document bytes themselves), the mean
    compare is cross-multiplied (no float), undecodable formats keep
    NULL signatures, and the n_units int64-sign guard raises."""
    import pytest as _pt

    from qctimeseries_spark.datapipe.multimodal import (
        attach_media,
        media_ahash,
    )

    docs = spark.createDataFrame(
        [
            (0, "abcABCxyz" * 10),   # %6=0 -> png: units = text bytes
            (3, "jpeg-bound doc"),   # %6=3 -> jpeg: NULL signature
            (4, "wav doc body!!"),   # %3=1 -> wav: PCM16 LE samples
        ],
        "doc_id long, text string",
    )
    media = attach_media(docs)
    out = {r.media_id: r for r in media_ahash(media, n_units=48).collect()}

    def ahash(units, n_units=48):
        w = list(units)[:n_units]
        n, tot = len(w), sum(w)
        return sum(1 << j for j, u in enumerate(w) if u * n > tot)

    png_text = "abcABCxyz" * 10
    assert out[0].signature == ahash(png_text.encode())
    assert out[3].signature is None  # no aHash route for DC-only JPEG
    import struct

    wav_bytes = "wav doc body!!".encode()
    n = len(wav_bytes) // 2
    samples = struct.unpack(f"<{n}h", wav_bytes[: 2 * n])
    assert out[4].signature == ahash(samples)

    with _pt.raises(ValueError, match=r"n_units"):
        media_ahash(media, n_units=63)


def test_truncated_container_yields_null_rows_not_task_failure(spark):
    """A WELL-FRAMED but short IHDR chunk escapes parse_media as
    struct.error (not ValueError) — the r10 advisor's scenario; every
    per-row decode operator must map it to an invalid/NULL row rather
    than a stage-killing task error."""
    import struct as _struct
    import zlib as _zlib

    from qctimeseries_spark.datapipe.multimodal import (
        decode_media,
        extract_features,
        media_ahash,
        parse_media,
    )

    def chunk(typ, data):
        return (
            _struct.pack(">I", len(data)) + typ + data
            + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    short_ihdr = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00\x00\x00")
    with pytest.raises(_struct.error):
        parse_media(short_ihdr)  # the escape route being guarded

    good = build_payload(6, "ok")
    media = spark.createDataFrame(
        [
            (1, "image", "png", len(short_ihdr), bytearray(short_ihdr)),
            (6, "image", "png", int(len(good)), bytearray(good)),
        ],
        "media_id long, modality string, fmt string, n_bytes long,"
        " payload binary",
    )
    sig = {r.media_id: r for r in media_ahash(media, n_units=48).collect()}
    assert sig[1].signature is None
    assert sig[6].signature is not None
    dec = {r.media_id: r for r in decode_media(media).collect()}
    assert dec[1].decoded is False and dec[6].decoded is True
    feats = {r.media_id: r for r in extract_features(media, dim=4).collect()}
    assert feats[1].valid is False and feats[6].valid is True


def test_jpeg_dc_grid_decodes_wheel_and_skips_ac_spectra():
    """jpeg_dc_grid must recover the exact quantized DC chain: (a) on
    the DC-tier wheel files attach_media builds, and (b) on a
    hand-encoded AC-bearing file where the DC chain is interleaved
    with real AC run/size + ZRL data that must be Huffman-skipped
    bit-exactly (one mis-skipped bit derails every later DC)."""
    from qctimeseries_spark.datapipe.multimodal import (
        JPEG_AC_COUNTS,
        JPEG_AC_SYMBOLS,
        JPEG_DC_COUNTS,
        JPEG_DC_SYMBOLS,
        _BitWriter,
        _huff_canonical,
        _jpeg_dc_header,
        build_payload,
        jpeg_dc_grid,
        jpeg_dims,
        jpeg_qdc,
    )

    for mid in (3, 9, 21, 243):
        w, h = jpeg_dims(mid)
        nb = (w // 8) * (h // 8)
        g = jpeg_dc_grid(build_payload(mid, "payload text ignored"))
        assert g["qdcs"] == [jpeg_qdc(mid, b) for b in range(nb)]
        assert (g["width"], g["height"]) == (w, h)

    dc_codes = _huff_canonical(JPEG_DC_COUNTS, JPEG_DC_SYMBOLS)
    ac_codes = _huff_canonical(JPEG_AC_COUNTS, JPEG_AC_SYMBOLS)
    w = _BitWriter()

    def put(codes, sym):
        c, ln = codes[sym]
        w.write(c, ln)

    def put_mag(v):
        s = abs(v).bit_length()
        w.write(v if v > 0 else v + (1 << s) - 1, s)

    # block 0: DC diff +3, AC (+2, ZRL, run-1 -4), EOB
    put(dc_codes, 2); put_mag(3)
    put(ac_codes, 0x02); put_mag(2)
    put(ac_codes, 0xF0)
    put(ac_codes, 0x13); put_mag(-4)
    put(ac_codes, 0x00)
    # block 1: DC diff -5 (absolute DC -2), AC run-3 +1, EOB
    put(dc_codes, 3); put_mag(-5)
    put(ac_codes, 0x31); put_mag(1)
    put(ac_codes, 0x00)
    payload = _jpeg_dc_header(16, 8) + w.finish() + b"\xff\xd9"
    assert jpeg_dc_grid(payload)["qdcs"] == [3, -2]


def test_media_dc_phash_buckets_planted_dups(spark):
    """m7 semantics: identical DC grids bucket together across
    different media ids, a uniform-brightness shift (constant added
    to every DC) keeps the signature, non-JPEG and corrupt payloads
    come back NULL, and the int64-sign guard raises."""
    from qctimeseries_spark.datapipe.multimodal import (
        build_payload,
        encode_jpeg_dc,
        media_dc_phash,
    )

    grid = [-5, -9, -7, -12, -6, -11, -8, -10]
    shifted = [q + 3 for q in grid]
    rows = [
        (1, bytearray(encode_jpeg_dc(32, 16, grid))),
        (2, bytearray(encode_jpeg_dc(32, 16, grid))),       # planted dup
        (3, bytearray(encode_jpeg_dc(32, 16, shifted))),    # brightness
        (4, bytearray(encode_jpeg_dc(16, 32, grid))),       # same grid, other dims
        (5, bytearray(build_payload(6, "png doc"))),        # non-jpeg
        (6, bytearray(b"\xff\xd8garbage")),                 # corrupt jpeg
        (7, None),                                          # failed fetch
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in media_dc_phash(media).collect()}
    assert out[1].signature is not None
    assert out[1].signature == out[2].signature == out[3].signature
    assert out[4].signature == out[1].signature  # raster order equal here
    assert out[5].fmt == "png" and out[5].signature is None
    assert out[6].signature is None
    assert out[7].signature is None and out[7].fmt is None

    import pytest as _pt

    with _pt.raises(ValueError, match="n_blocks"):
        media_dc_phash(media, n_blocks=63)
