"""Round-9 regression tests: the round-8 ADVICE fixes.

1. hex_hamming_pairs at radius >= hex_len — the pigeonhole guarantee
   cannot be formed from whole-hex-char chunks, so the operator must
   fall back to the exact all-pairs scan over DISTINCT signatures
   (completeness over speed) instead of silently missing pairs.
2. hex_hamming_pairs duplicate (id, sig) input rows must not duplicate
   output pairs.
3. Fragmented MP4 implicit-base mode (ISO 14496-12 §8.8.7): the base
   data offset of a second/subsequent traf with NEITHER tfhd base flag
   is the END of the preceding traf's data — not the moof's first byte.
"""

import itertools
import random

import pytest

from tiki_e_commerce_analytics_etl_spark.operators import dedup as dedup_ops
from tiki_e_commerce_analytics_etl_spark.operators import isobmff
from tiki_e_commerce_analytics_etl_spark.operators.isobmff import (
    _TRUN_DATA_OFFSET,
    _TRUN_SAMPLE_SIZE,
    _box,
    _full,
)


def test_hex_hamming_pairs_large_radius_falls_back_complete(request):
    """radius in [hex_len, 4*hex_len): the chunk join cannot be
    pigeonhole-complete (16 one-char chunks can't cover 16+ flips),
    so the exact all-pairs-over-distinct fallback must find EXACTLY
    the brute-force pair set."""
    spark = request.getfixturevalue("spark")
    rng = random.Random(17)
    base = rng.getrandbits(64)
    sigs = []
    for i in range(30):
        v = base
        for _ in range(rng.randint(0, 24)):  # well past hex_len flips
            v ^= 1 << rng.randrange(64)
        sigs.append((i, f"{v:016x}"))
    sigs += [(100, sigs[0][1])]  # planted exact dup
    df = spark.createDataFrame(sigs, "id: long, h: string")

    for radius in (16, 20, 63):  # all >= hex_len -> fallback path
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup_ops.hex_hamming_pairs(
                df, id_col="id", sig_col="h", radius=radius
            ).collect()
        }
        want = set()
        for (ia, ha), (ib, hb) in itertools.combinations(sigs, 2):
            d = bin(int(ha, 16) ^ int(hb, 16)).count("1")
            if d <= radius:
                want.add((min(ia, ib), max(ia, ib), d))
        assert got == want, f"radius {radius}"


def test_hex_hamming_pairs_duplicate_id_sig_rows_collapse(request):
    """Duplicate (id, sig) input rows are collapsed: each unordered
    pair appears exactly once, on both the pigeonhole and the exact
    (distance-0) routes."""
    spark = request.getfixturevalue("spark")
    rows = [
        (1, "00000000000000ff"),
        (1, "00000000000000ff"),  # dup (id, sig) row
        (2, "00000000000000ff"),  # exact dup of 1
        (2, "00000000000000ff"),
        (3, "00000000000000fe"),  # 1 flip away
        (3, "00000000000000fe"),
    ]
    df = spark.createDataFrame(rows, "id: long, h: string")
    out = dedup_ops.hex_hamming_pairs(df, "id", "h", radius=2).collect()
    got = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in out)
    assert got == [(1, 2, 0), (1, 3, 1), (2, 3, 1)]


def _traf(track_id: int, sizes: list[int], data_offset: int | None) -> bytes:
    """Hand-built traf: tfhd with NO base flags (implicit-base mode),
    one trun with per-sample sizes and an optional data_offset."""
    tfhd = _box(
        b"tfhd", bytes([0]) + (0).to_bytes(3, "big") + track_id.to_bytes(4, "big")
    )
    tflags = _TRUN_SAMPLE_SIZE | (_TRUN_DATA_OFFSET if data_offset is not None else 0)
    body = len(sizes).to_bytes(4, "big")
    if data_offset is not None:
        body += data_offset.to_bytes(4, "big", signed=True)
    body += b"".join(s.to_bytes(4, "big") for s in sizes)
    trun = _box(b"trun", bytes([0]) + tflags.to_bytes(3, "big") + body)
    return _box(b"traf", tfhd + trun)


def _two_traf_fmp4(foreign_traf: bytes, video_sizes: list[int], mdat: bytes) -> bytes:
    """ftyp+moov from the muxer (video track 1, empty sample tables),
    then ONE hand-built moof holding [foreign traf, video traf] — the
    video traf in pure implicit-base mode (no tfhd base flags, no trun
    data_offset), the multi-traf shape the muxer never emits."""
    header = isobmff.mp4_mux_fragmented([], width=4, height=1)
    video = _traf(1, video_sizes, data_offset=None)
    mfhd = _full(b"mfhd", (1).to_bytes(4, "big"))
    moof = _box(b"moof", mfhd + foreign_traf + video)
    return header + moof + _box(b"mdat", mdat)


def test_fmp4_multi_traf_implicit_base_is_previous_traf_end():
    """§8.8.7: with neither tfhd base flag set, the SECOND traf's base
    is the end of the first traf's data.  The first (foreign, track 7)
    traf points its trun data_offset at the mdat payload and covers 8
    bytes; the video traf (track 1, no data_offset at all) must start
    exactly after them — resolving from the moof's first byte instead
    would slice moof bytes."""
    foreign_payload = b"aaabbbbb"  # sizes 3 + 5
    vid = [b"VID1", b"VID2"]
    # moof length is independent of the data_offset VALUE: build once
    # with a placeholder to learn the length, then rebuild
    probe = _traf(7, [3, 5], data_offset=0)
    mfhd = _full(b"mfhd", (1).to_bytes(4, "big"))
    moof_len = len(
        _box(b"moof", mfhd + probe + _traf(1, [4, 4], data_offset=None))
    )
    foreign = _traf(7, [3, 5], data_offset=moof_len + 8)
    payload = _two_traf_fmp4(
        foreign, [4, 4], foreign_payload + b"".join(vid)
    )
    usec, frames = isobmff.mp4_demux(payload)
    assert frames == vid
    assert usec == 40000  # trex default duration for track 1


def test_fmp4_implicit_base_after_unresolvable_traf_raises():
    """A preceding traf whose data cannot be located (foreign track,
    no size source anywhere) leaves the implicit base unresolvable:
    the video traf must raise instead of silently using the moof
    start."""
    # foreign traf: trun with NO per-sample fields, no tfhd/trex size
    tfhd = _box(b"tfhd", bytes([0]) + (0).to_bytes(3, "big") + (7).to_bytes(4, "big"))
    trun = _box(
        b"trun", bytes([0]) + (0).to_bytes(3, "big") + (2).to_bytes(4, "big")
    )
    foreign = _box(b"traf", tfhd + trun)
    payload = _two_traf_fmp4(foreign, [4, 4], b"VID1VID2")
    with pytest.raises(NotImplementedError):
        isobmff.mp4_demux(payload)


def test_fmp4_single_traf_implicit_base_unchanged():
    """The muxer's own 'default' base mode (single traf per moof,
    §8.8.7 first-traf = moof first byte) still round-trips."""
    frames = [b"abcd", b"efgh", b"ijkl"]
    p = isobmff.mp4_mux_fragmented(
        frames, width=4, height=1, base_mode="default", frames_per_fragment=2
    )
    usec, got = isobmff.mp4_demux(p)
    assert got == frames
