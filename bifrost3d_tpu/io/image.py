"""Image loading/saving.

Counterpart of StbImageLoader / StbImageWriter / TinyExr (SURVEY.md §2.6):
PNG/JPG/TGA via PIL (byte formats flagged sRGB like the reference loader),
plus a minimal self-contained EXR reader/writer (32-bit float,
uncompressed scanlines) standing in for TinyExr.
"""

from __future__ import annotations

import struct

import numpy as np

from bifrost3d_tpu.math.color import linear_to_srgb, srgb_to_linear


def load_image(path: str, to_linear: bool = True) -> np.ndarray:
    """→ float32 [h, w, 3|4] (linear if to_linear and the file is LDR)."""
    if path.lower().endswith(".exr"):
        return load_exr(path)
    from PIL import Image
    img = Image.open(path)
    arr = np.asarray(img).astype(np.float32)
    if arr.dtype == np.float32 and arr.max() > 1.5:
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, axis=-1)
    if to_linear:
        rgb = np.asarray(srgb_to_linear(arr[..., :3]))
        arr = np.concatenate([rgb, arr[..., 3:]], axis=-1) if arr.shape[-1] == 4 else rgb
    return arr


def srgb_encode_u8(linear_rgb) -> np.ndarray:
    srgb = np.asarray(linear_to_srgb(np.clip(np.asarray(linear_rgb), 0.0, 1.0)))
    return (srgb * 255.0 + 0.5).astype(np.uint8)


def save_image(path: str, linear_rgb, from_linear: bool = True) -> None:
    """Save float [h, w, 3] to PNG/JPG (sRGB-encoded) or EXR (linear)."""
    if path.lower().endswith(".exr"):
        save_exr(path, linear_rgb)
        return
    from PIL import Image
    arr = np.asarray(linear_rgb)
    data = srgb_encode_u8(arr) if from_linear else (
        np.clip(arr, 0, 1) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(data).save(path)


# ---------------------------------------------------------------------------
# Minimal EXR (float32, uncompressed) — TinyExr stand-in.
# ---------------------------------------------------------------------------

_EXR_MAGIC = 20000630


def save_exr(path: str, image) -> None:
    """Write [h, w, 3] float32 as an uncompressed scanline EXR."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    channels = ["B", "G", "R"]  # alphabetical, EXR requirement

    def attr(name, type_name, payload):
        return (name.encode() + b"\0" + type_name.encode() + b"\0"
                + struct.pack("<i", len(payload)) + payload)

    chlist = b""
    for c in channels:
        chlist += (c.encode() + b"\0" + struct.pack("<i", 2)  # FLOAT
                   + struct.pack("<i", 0) + struct.pack("<ii", 1, 1))
    chlist += b"\0"

    header = b""
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", struct.pack("<B", 0))
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", struct.pack("<B", 0))
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    offset_table_pos = 8 + len(header)
    data_start = offset_table_pos + 8 * h
    line_size = 8 + w * 4 * 3
    offsets = [data_start + y * line_size for y in range(h)]

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _EXR_MAGIC, 2))
        f.write(header)
        for off in offsets:
            f.write(struct.pack("<Q", off))
        for y in range(h):
            f.write(struct.pack("<ii", y, w * 4 * 3))
            # Channels alphabetical: B, G, R — each a full row.
            f.write(img[y, :, 2].tobytes())
            f.write(img[y, :, 1].tobytes())
            f.write(img[y, :, 0].tobytes())


def load_exr(path: str) -> np.ndarray:
    """Read EXRs written by :func:`save_exr` (float32, uncompressed)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, _version = struct.unpack_from("<ii", data, 0)
    assert magic == _EXR_MAGIC, "not an EXR file"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        name_end = data.index(b"\0", pos)
        name = data[pos:name_end].decode()
        pos = name_end + 1
        type_end = data.index(b"\0", pos)
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = data[pos:pos + size]
        pos += size
    pos += 1
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    compression = attrs["compression"][0]
    assert compression == 0, "only uncompressed EXR supported"
    # Parse channel names (alphabetical order in file).
    chl = attrs["channels"]
    names = []
    cpos = 0
    while chl[cpos] != 0:
        nend = chl.index(b"\0", cpos)
        names.append(chl[cpos:nend].decode())
        cpos = nend + 1 + 16
    offsets = struct.unpack_from(f"<{h}Q", data, pos)
    img = np.zeros((h, w, 3), np.float32)
    ch_to_idx = {"R": 0, "G": 1, "B": 2}
    for yi, off in enumerate(offsets):
        y, _size = struct.unpack_from("<ii", data, off)
        row_pos = off + 8
        for name in names:
            row = np.frombuffer(data, np.float32, w, row_pos)
            if name in ch_to_idx:
                img[y, :, ch_to_idx[name]] = row
            row_pos += w * 4
    return img
