"""GIF decoder: real LZW decompression, interlace, color tables.

The fixture encoder in operators/multimodal.py emits all-literal LZW (so
the oracle has a closed-form length); these tests additionally verify the
decoder against a REFERENCE COMPRESSING encoder (spec dictionary growth,
variable code width 9→12, the KwKwK just-added-code case, interlace
reordering, local color tables) — the streams a real-world GIF contains.
"""

import struct

import numpy as np

from distributed_extraction_framework_spark.operators import multimodal as M


def _ref_lzw_encode(indices, mcs=8):
    """Spec GIF-LZW compressor (test reference): builds the dictionary,
    grows code width when next_code passes 2^width, emits LSB-first."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    d = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    width = mcs + 1
    acc = n = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    emit(clear)
    wbuf = bytes([indices[0]])
    for s in indices[1:]:
        c = bytes([s])
        if wbuf + c in d:
            wbuf += c
            continue
        emit(d[wbuf])
        if next_code <= 4095:
            d[wbuf + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        wbuf = c
    emit(d[wbuf])
    emit(eoi)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _container(idx, palette, lzw, interlaced=False, local_ct=False):
    """Wrap an LZW stream in a GIF89a container (GCT or LCT, optional
    interlace flag)."""
    h, w = idx.shape
    ct = np.zeros((256, 3), np.uint8)
    ct[: len(palette)] = palette
    gct_flag = 0x00 if local_ct else 0xF7
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, gct_flag, 0, 0)
    if not local_ct:
        head += ct.tobytes()
    # a GCE extension block the decoder must skip
    head += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipk = (0x87 if local_ct else 0) | (0x40 if interlaced else 0)
    head += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipk)
    if local_ct:
        head += ct.tobytes()
    head += bytes([8])
    sub = bytearray()
    for s in range(0, len(lzw), 255):
        block = lzw[s : s + 255]
        sub += bytes([len(block)]) + block
    return head + bytes(sub) + b"\x00\x3b"


_PAL = np.stack(
    [np.arange(256), (np.arange(256) * 2) % 256, (np.arange(256) * 7) % 256],
    axis=1,
).astype(np.uint8)


def test_fixture_encoder_roundtrip_and_closed_form_length():
    y, x = np.mgrid[0:11, 0:12]
    idx = ((x * 3 + y * 5 + 4) % 256).astype(np.uint8)
    payload = M._encode_gif(idx, _PAL)
    # closed form the SQL oracle uses (single ≤250-pixel... 132 pixels)
    assert len(payload) == 795 + (9 * (idx.size + 2) + 7) // 8
    img = M._decode_gif(payload)
    assert img is not None and np.array_equal(img, _PAL[idx])


def test_fixture_encoder_multi_clear():
    """>250 pixels forces the re-CLEAR path (and >255-byte sub-blocking)."""
    y, x = np.mgrid[0:24, 0:25]
    idx = ((x * 7 + y * 13) % 256).astype(np.uint8)
    img = M._decode_gif(M._encode_gif(idx, _PAL))
    assert img is not None and np.array_equal(img, _PAL[idx])


def test_compressed_stream_with_width_growth():
    """A repetitive 64x64 image compresses through >1024 dictionary
    entries — decode crosses the 9→10→11-bit width boundaries."""
    y, x = np.mgrid[0:64, 0:64]
    idx = ((x // 4 + y // 4) % 16).astype(np.uint8) * 3
    lzw = _ref_lzw_encode(idx.ravel().tolist())
    img = M._decode_gif(_container(idx, _PAL, lzw))
    assert img is not None and np.array_equal(img, _PAL[idx])


def test_kwkwk_case():
    """Constant runs hit the 'code == len(table)' just-added branch."""
    idx = np.zeros((16, 16), np.uint8)
    idx[8:] = 7
    lzw = _ref_lzw_encode(idx.ravel().tolist())
    img = M._decode_gif(_container(idx, _PAL, lzw))
    assert img is not None and np.array_equal(img, _PAL[idx])


def test_interlaced_and_local_color_table():
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 256, (13, 9)).astype(np.uint8)
    order = np.concatenate(
        [np.arange(0, 13, 8), np.arange(4, 13, 8),
         np.arange(2, 13, 4), np.arange(1, 13, 2)]
    )
    stored = idx[order]
    lzw = _ref_lzw_encode(stored.ravel().tolist())
    img = M._decode_gif(_container(idx, _PAL, lzw, interlaced=True))
    assert img is not None and np.array_equal(img, _PAL[idx])
    lzw2 = _ref_lzw_encode(idx.ravel().tolist())
    img2 = M._decode_gif(_container(idx, _PAL, lzw2, local_ct=True))
    assert img2 is not None and np.array_equal(img2, _PAL[idx])


def test_random_roundtrips():
    rng = np.random.RandomState(11)
    for trial in range(6):
        h, w = rng.randint(3, 40), rng.randint(3, 40)
        # mix repetitive and noisy content so compression varies
        if trial % 2:
            idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
        else:
            idx = (np.add.outer(np.arange(h), np.arange(w)) % 32).astype(
                np.uint8
            )
        lzw = _ref_lzw_encode(idx.ravel().tolist())
        img = M._decode_gif(_container(idx, _PAL, lzw))
        assert img is not None and np.array_equal(img, _PAL[idx]), trial


def test_garbage_and_guards():
    assert M._decode_gif(b"GIF89a") is None
    assert M._decode_gif(b"NOTGIF" + b"\x00" * 50) is None
    # oversized dimensions must be rejected, not allocated
    big = b"GIF89a" + struct.pack("<HHBBB", 60000, 60000, 0, 0, 0) + (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 60000, 60000, 0)
    )
    assert M._decode_gif(big) is None
    # truncated LZW stream → None, no exception
    y, x = np.mgrid[0:8, 0:8]
    idx = ((x + y) % 256).astype(np.uint8)
    payload = bytearray(M._encode_gif(idx, _PAL))
    assert M._decode_gif(bytes(payload[: len(payload) // 2])) is None


def test_dispatch_and_features(spark):
    """GIF rows flow through extract_media_features with decoded=true and
    content (not digest) features; synth_media_exact emits them."""
    media = M.synth_media_exact(spark, 60)
    gif_ids = [i for i in range(0, 60, 3) if (i // 3) % 5 == 4]
    rows = {
        r["media_id"]: r
        for r in M.extract_media_features(media, 8).collect()
    }
    assert gif_ids and all(rows[i]["decoded"] for i in gif_ids)
