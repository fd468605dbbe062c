"""Pure-stdlib animated-GIF codec: the real-pixel tier for VIDEO-shaped
media (frame sequences), like operators/png.py is for still images.

No video library exists in this environment, but animated GIF is a
genuine multi-frame container that pure Python can decode: LZW
decompression, palette lookup, per-frame compositing (disposal,
transparency, partial-frame rects, interlacing) are all bit
operations. With this module the frame-sampling stage
(operators/multimodal.py) runs REAL frame extraction end-to-end
in-sandbox: decode → composite → sample every k-th frame — and swaps
to a proper codec (PyAV/ffmpeg) for real video at deployment without
touching the Spark plumbing.

Like png.py, everything here is self-contained module-level functions
(cloudpickled by-value into executors — no package install needed on
workers).

Format notes (GIF89a): logical screen descriptor + optional global
palette; a stream of extension blocks (graphic control carries
disposal/transparency/delay) and image descriptors (own rect, optional
local palette, optional interlacing, LZW-compressed indices); trailer
0x3B. Disposal 0/1 = leave, 2 = restore background (transparent), 3 =
restore previous canvas.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in GIF_MAGICS


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-variant LZW: variable code width (min+1)..12 bits, LSB-first
    bit packing, CLEAR resets the dictionary."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            dict_.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            dict_.append(entry)
        out += entry
        prev = entry
        if len(dict_) == (1 << width) and width < 12:
            width += 1


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode` (used by the test encoder)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode every frame: ``(width, height, [rgb_bytes, ...])`` with
    full disposal/transparency compositing — frame i is the composited
    canvas as a viewer would show it, 3 bytes/pixel."""
    if not is_gif(data):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack("<HH", data[6:10])
    packed, bg_idx = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n

    canvas = bytearray(w * h * 3)  # composited RGB
    painted = bytearray(w * h)  # 0 = never painted (treated as black)
    frames: list[bytes] = []
    transparent: int | None = None
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            ln = data[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + ln])
            p += ln

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9:  # graphic control
                blk = data[pos + 3 : pos + 3 + 4]
                disposal = (blk[0] >> 2) & 0x7
                transparent = blk[3] if blk[0] & 1 else None
                pos += 3 + 4 + 1  # intro+label, size byte+4, terminator
            else:  # comment/app/plain-text: skip sub-blocks
                _, pos = read_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at {pos}")
        # image descriptor
        left, top, fw, fh = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = _lzw_decode(min_code, lzw)

        if ipacked & 0x40:  # interlaced: reorder rows
            rows = [b""] * fh
            src = 0
            for start, step in _DEINTERLACE:
                for y in range(start, fh, step):
                    rows[y] = idx[src * fw : (src + 1) * fw]
                    src += 1
            idx = b"".join(rows)

        saved = bytes(canvas) if disposal == 3 else None
        for y in range(fh):
            cy = top + y
            if cy >= h:
                break
            row = idx[y * fw : (y + 1) * fw]
            for x, ci in enumerate(row):
                cx = left + x
                if cx >= w or ci == transparent:
                    continue
                o = (cy * w + cx) * 3
                canvas[o : o + 3] = pal[ci * 3 : ci * 3 + 3]
                painted[cy * w + cx] = 1
        frames.append(bytes(canvas))

        if disposal == 2:  # restore background = transparent region
            for y in range(fh):
                cy = top + y
                if cy >= h:
                    break
                for x in range(fw):
                    cx = left + x
                    if cx >= w:
                        continue
                    o = (cy * w + cx) * 3
                    canvas[o : o + 3] = b"\x00\x00\x00"
                    painted[cy * w + cx] = 0
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        disposal = 0
        transparent = None
    return w, h, frames


def gif_n_frames(data: bytes) -> int:
    """Frame count without compositing (descriptor walk only)."""
    if not is_gif(data):
        raise ValueError("not a GIF payload")
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ipacked = data[pos + 9]
        pos += 10
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # lzw min code size
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
        n += 1
    return n


# ---------------------------------------------------------------------------
# encode (full-frame, global palette — enough to round-trip tests)
# ---------------------------------------------------------------------------

def gif_encode(
    w: int, h: int, frames_rgb: list[bytes], delay_cs: int = 4
) -> bytes:
    """Minimal GIF89a writer: one global palette built from the distinct
    colors of all frames (≤ 256), full-frame images, disposal 1."""
    colors: dict[bytes, int] = {}
    for fr in frames_rgb:
        if len(fr) != w * h * 3:
            raise ValueError("frame size mismatch")
        for i in range(0, len(fr), 3):
            c = fr[i : i + 3]
            if c not in colors:
                if len(colors) >= 256:
                    raise ValueError("more than 256 distinct colors")
                colors[c] = len(colors)
    nbits = max(1, (len(colors) - 1).bit_length())
    pal_n = 1 << nbits
    palette = b"".join(
        sorted(colors, key=colors.get)
    ) + b"\x00\x00\x00" * (pal_n - len(colors))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (nbits - 1), 0, 0])
    out += palette
    min_code = max(2, nbits)
    for fr in frames_rgb:
        out += bytes([0x21, 0xF9, 4, 0x04, delay_cs & 0xFF, delay_cs >> 8, 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        idx = bytes(colors[fr[i : i + 3]] for i in range(0, len(fr), 3))
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
