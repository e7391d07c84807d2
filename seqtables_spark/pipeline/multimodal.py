"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow-batched mapInPandas decode
operators, partition sizing) is REAL and tested; the pixel/sample
decode itself is STUBBED deterministically because media codecs are
not in this container - swap `_fake_decode_image` for PIL/ffmpeg in
production, the operator shape is unchanged.

Design for 100 TB of media: binary payloads stay in parquet (or are
pointed to via (uri, offset, length) for >2 GB objects); decode runs
mapInPandas so one task holds only an Arrow batch of blobs; feature
columns come back as fixed-size arrays that downstream similarity
ops (pipeline/similarity.py) consume directly.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "width int, height int, n_frames int, sample_rate int"
)

IMAGE_FEATURES_SCHEMA = "media_id long, n_bytes long, sha256 string, features array<float>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns every media table carries: byte length
    and content digest - pure built-ins, no decode needed."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode_image(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for image decode + feature extraction.

    Real implementation: PIL.Image.open -> resize -> model embed.
    The fake derives `n_features` floats from the sha256 digest so
    tests are stable and the batch shape matches production.
    """
    digest = hashlib.sha256(payload).digest()
    out = []
    for i in range(n_features):
        (v,) = struct.unpack(">I", digest[4 * i : 4 * i + 4])
        out.append((v % 10_000) / 10_000.0)
    return out


MEDIA_MAGIC = {
    b"\x89PNG\r\n\x1a\n": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"P6": "ppm",
    b"P5": "pgm",
    b"RIFF": "riff",  # wav/avi/webp container; bytes 8-11 disambiguate
    b"fLaC": "flac",
    b"OggS": "ogg",
}


def detect_media_type(payload_col: str = "payload"):
    """Column expr: media type from MAGIC BYTES (no decode, pure
    built-ins) - the first triage step over an opaque binary column
    at corpus scale. Unknown signatures -> 'unknown'."""
    c = F.col(payload_col)
    expr = F.lit("unknown")
    for magic, name in reversed(list(MEDIA_MAGIC.items())):
        expr = F.when(
            F.substring(c, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(expr)
    return expr


def decode_ppm(payload: bytes) -> "tuple":
    """REAL decode of binary PPM (P6, RGB) / PGM (P5, gray) - the one
    raster format that needs no codec library, parsed with numpy.
    Returns (width, height, channels, pixel_matrix float32 in [0,1]
    shaped (h, w, c)). Raises ValueError on anything else."""
    import numpy as np

    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header = magic, width, height, maxval as ASCII tokens; '#'
    # comments run to end-of-line; header ends after ONE whitespace
    # char following maxval
    toks, i, tok = [], 2, b""
    while len(toks) < 3 and i < len(payload):
        ch = payload[i : i + 1]
        if ch == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif ch.isspace():
            if tok:
                toks.append(int(tok))
                tok = b""
        else:
            tok += ch
        i += 1
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = toks
    ch = 3 if payload[:2] == b"P6" else 1
    if not (0 < maxval < 65536):
        raise ValueError(f"invalid PPM maxval {maxval}")
    if maxval > 255:
        # per spec: maxval 256..65535 means 2-byte BIG-ENDIAN samples
        raw = np.frombuffer(payload, ">u2", count=w * h * ch, offset=i)
    else:
        raw = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=i)
    return w, h, ch, raw.reshape(h, w, ch).astype(np.float32) / float(maxval)


def _pil_decode(payload: bytes) -> "tuple | None":
    """Compressed-codec splice point: decode PNG/JPEG/GIF/... via PIL
    when it is installed (guarded import - the engine container does
    not ship it; production clusters do). Returns the same
    (w, h, ch, float32 [0,1] pixel matrix) shape as decode_ppm, or
    None when PIL is absent or cannot parse the payload."""
    try:
        import io

        from PIL import Image  # optional dependency
    except ImportError:
        return None
    import numpy as np

    try:
        with Image.open(io.BytesIO(payload)) as im:
            im = im.convert("RGB")
            px = np.asarray(im, np.float32) / 255.0
    except Exception:
        return None
    h, w = px.shape[:2]
    return w, h, 3, px


def _real_image_features(payload: bytes) -> "list | None":
    """8 real features for decodable payloads (PPM/PGM natively; any
    PIL-supported format when PIL is installed): width/1e4,
    height/1e4, aspect, per-channel means (gray replicated), gray
    std, fill=0. None when the format needs an absent codec."""
    import numpy as np

    payload = bytes(payload)
    try:
        w, h, ch, px = decode_ppm(payload)
    except ValueError:
        decoded = _pil_decode(payload)
        if decoded is None:
            return None
        w, h, ch, px = decoded
    means = px.mean(axis=(0, 1))
    if ch == 1:
        means = np.repeat(means, 3)
    gray = px.mean(axis=2)
    return [
        w / 10_000.0,
        h / 10_000.0,
        w / float(h),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(gray.std()),
        0.0,
    ]


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
    real_decode: bool = False,
) -> DataFrame:
    """mapInPandas decode operator: binary -> feature vector.

    Arrow moves each batch of blobs to python once; the UDF is the
    only python in the pipeline. real_decode=True REALLY decodes the
    formats that need no codec library (binary PPM/PGM, via
    decode_ppm) and raises NotImplementedError for compressed formats
    (PNG/JPEG need PIL - plug it into _real_image_features, nothing
    else changes). The default keeps the deterministic sha256-derived
    stand-in for every payload, which is what the value oracle pins."""
    if n_features > 8:
        # the sha256-derived stand-in has exactly 8 four-byte words;
        # fail at call time, not as a struct.error inside every task
        raise ValueError(
            f"decode_image_features: the stubbed decoder derives at most "
            f"8 features (sha256 digest), got n_features={n_features}"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii

        import numpy as np

        for pdf in batches:
            blobs = [bytes(p) for p in pdf[payload_col]]
            n = len(blobs)
            digests = b"".join(hashlib.sha256(b).digest() for b in blobs)
            if real_decode:
                feats = []
                for b in blobs:
                    f8 = _real_image_features(b)
                    if f8 is None:
                        raise NotImplementedError(
                            "compressed image codecs (PNG/JPEG) need PIL, "
                            "which is not installed here - with pillow on "
                            "the executors _real_image_features decodes "
                            "them automatically; PPM/PGM decode natively"
                        )
                    feats.append(f8)
                feats_mat = np.asarray(feats, np.float32)
            else:
                # ---- SPLICE POINT for a real codec -----------------
                # digest reuse = decode stand-in; production replaces
                # it with a batched codec/model call ((n,H,W,C) stack
                # -> batched embed). Everything around it stays.
                dg = np.frombuffer(digests, dtype=">u4").reshape(n, 8)
                feats_mat = ((dg[:, :n_features] % 10_000) / 10_000.0).astype(
                    np.float32
                )
            hex_all = binascii.hexlify(digests).decode("ascii")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": np.fromiter(
                        (len(b) for b in blobs), np.int64, n
                    ),
                    "sha256": [hex_all[i * 64 : (i + 1) * 64] for i in range(n)],
                    "features": list(feats_mat),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, duration_s double, n_windows int, "
    "window_energy array<float>"
)


def decode_wav(payload: bytes) -> "tuple":
    """REAL decode of RIFF/WAVE PCM (8- or 16-bit) - the one audio
    container that needs no codec library. Walks the chunk list
    (chunks pad to even sizes), down-mixes channels by mean, and
    returns (sample_rate, mono float32 samples in [-1, 1]). Raises
    ValueError for non-WAV or compressed encodings."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = max(1, int.from_bytes(fmt[2:4], "little"))
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(
            f"only PCM 8/16-bit WAV decodes natively (fmt={audio_fmt}, "
            f"bits={bits})"
        )
    if bits == 16:
        x = (
            np.frombuffer(data, "<i2", count=len(data) // 2).astype(np.float32)
            / 32768.0
        )
    else:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    if n_ch > 1:
        x = x[: (x.size // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return rate, x


def _soundfile_decode(payload: bytes) -> "tuple | None":
    """Compressed-audio splice point, the audio twin of _pil_decode:
    decode FLAC/OGG/... via the soundfile library when it is
    installed (guarded import - the engine container does not ship
    it; production clusters do). Returns the same (sample_rate, mono
    float32 samples in [-1, 1]) shape as decode_wav, or None when
    soundfile is absent or cannot parse the payload."""
    try:
        import io

        import soundfile  # optional dependency
    except ImportError:
        return None
    import numpy as np

    try:
        x, rate = soundfile.read(io.BytesIO(bytes(payload)), dtype="float32")
    except Exception:
        return None
    x = np.asarray(x, np.float32)
    if x.ndim > 1:  # down-mix channels by mean, like decode_wav
        x = x.mean(axis=1)
    return int(rate), x


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    sample_rate: int = 16_000,
    window_s: float = 1.0,
    real_decode: bool = False,
) -> DataFrame:
    """mapInPandas audio decode operator: binary -> per-window energy
    features + duration (the audio twin of decode_image_features).

    Default path: the decode is STUBBED deterministically — payload
    bytes stand in for PCM samples (1 byte = 1 sample at the given
    sample_rate), window energy = mean |byte| per window normalized
    to [0,1] — which is what the value oracle pins. real_decode=True
    REALLY decodes the container that needs no codec library
    (RIFF/WAVE PCM 8/16-bit via decode_wav, honoring each file's OWN
    sample rate and down-mixing channels); compressed audio
    (flac/ogg/...) goes through the _soundfile_decode splice when the
    optional soundfile library is installed - the audio twin of the
    image path's _pil_decode - and raises NotImplementedError
    otherwise. The window fold is identical for all three sources."""
    win = max(1, int(sample_rate * window_s))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = [bytes(p) for p in pdf[payload_col]]
            n = len(blobs)
            lens = np.fromiter((len(b) for b in blobs), np.int64, n)
            if real_decode:
                n_bytes, durs, n_wins, energies = [], [], [], []
                for b in blobs:
                    try:
                        rate, x = decode_wav(b)
                    except ValueError as exc:
                        decoded = _soundfile_decode(b)
                        if decoded is None:
                            raise NotImplementedError(
                                "compressed audio codecs need the optional "
                                "soundfile library (absent or could not "
                                "parse this payload); PCM WAV decodes "
                                f"natively ({exc})"
                            ) from exc
                        rate, x = decoded
                    w = max(1, int(rate * window_s))
                    n_bytes.append(len(b))
                    durs.append(x.size / float(rate))
                    if x.size == 0:
                        n_wins.append(1)
                        energies.append(np.zeros(1, np.float32))
                        continue
                    starts = np.arange(0, x.size, w)
                    sums = np.add.reduceat(np.abs(x), starts)
                    wl = np.minimum(x.size - starts, w)
                    n_wins.append(starts.size)
                    energies.append((sums / wl).astype(np.float32))
                yield pd.DataFrame(
                    {
                        "media_id": pdf[id_col].astype("int64"),
                        "n_bytes": pd.Series(n_bytes, dtype="int64"),
                        "duration_s": pd.Series(durs, dtype="float64"),
                        "n_windows": pd.Series(n_wins, dtype="int32"),
                        "window_energy": energies,
                    }
                )
                continue
            # ---- SPLICE POINT for a real codec ---------------------
            # bytes-as-PCM is the decode stand-in; a production build
            # replaces this concat with soundfile/ffmpeg decoding each
            # blob into one concatenated float PCM buffer. The window
            # fold below is already batch array ops and is exactly
            # what real PCM would flow through.
            samples = np.frombuffer(b"".join(blobs), np.uint8)
            # --------------------------------------------------------
            # per-row window starts, all rows at once: reduceat over
            # the concatenated buffer (rows are adjacent, so each
            # row's last window ends where the next row starts)
            n_wins = np.maximum((lens + win - 1) // win, 1).astype(np.int64)
            row_off = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=row_off[1:])
            nonempty = lens > 0
            starts_per_row = [
                np.arange(row_off[i], row_off[i + 1], win)
                for i in np.flatnonzero(nonempty)
            ]
            energies: list = [[0.0] for _ in range(n)]
            if starts_per_row:
                starts = np.concatenate(starts_per_row)
                sums = np.add.reduceat(samples.astype(np.int64), starts)
                # window lengths: win except each row's last remainder
                wlens = np.minimum(
                    np.repeat(row_off[1:][nonempty], n_wins[nonempty]) - starts,
                    win,
                )
                flat_e = sums / (255.0 * wlens)
                k = 0
                for i in np.flatnonzero(nonempty):
                    m = int(n_wins[i])
                    energies[i] = flat_e[k : k + m].astype(np.float32)
                    k += m
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": lens,
                    "duration_s": lens / float(sample_rate),
                    "n_windows": n_wins.astype(np.int32),
                    "window_energy": energies,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 30,
    n_frames_col: str = "n_frames",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index
    (decode stubbed). Pure explode - the frame index plan is exactly
    what a real ffmpeg-backed extractor consumes. Media with zero (or
    NULL) frames contributes NO rows - without the filter,
    greatest(n-1, 0) would fabricate a frame_idx=0 row telling the
    extractor to decode a frame that does not exist."""
    return df.filter(F.col(n_frames_col) >= 1).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------
# Video decode: the frame-index plan above feeds THIS operator. Like
# the image (PPM) and audio (WAV) halves, one container decodes with
# no codec library — RAWV, a trivial uncompressed grayscale container
# (header + n_frames*(w*h) bytes) — so the full blob->frames->features
# path is real and value-tested; compressed video splices in via the
# optional imageio/av guard exactly like _pil_decode/_soundfile_decode.
# ---------------------------------------------------------------------

RAWV_MAGIC = b"RAWV"
_RAWV_HDR = "<4sBHHIB"  # magic, version, width, height, n_frames, fps
_RAWV_HDR_LEN = struct.calcsize(_RAWV_HDR)

VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, "
    "mean_intensity double, motion double"
)


def encode_rawv(frames, fps: int = 30) -> bytes:
    """Pack grayscale frames (numpy (n, h, w) uint8, or anything
    np.asarray can coerce) into a RAWV blob. The writer half of the
    codec exists so tests can round-trip real pixel data through the
    decode operator without any media library."""
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(frames, np.uint8))
    if arr.ndim != 3:
        raise ValueError(f"frames must be (n, h, w), got shape {arr.shape}")
    n, h, w = arr.shape
    if not (0 < w < 65536 and 0 < h < 65536):
        raise ValueError(f"width/height must fit u16, got {w}x{h}")
    hdr = struct.pack(_RAWV_HDR, RAWV_MAGIC, 1, w, h, n, int(fps))
    return hdr + arr.tobytes()


def decode_rawv(payload: bytes) -> "tuple":
    """REAL decode of a RAWV blob -> (width, height, n_frames, fps,
    frames ndarray (n, h, w) uint8). Raises ValueError on anything
    else (magic mismatch, truncated pixel data)."""
    import numpy as np

    if payload[: len(RAWV_MAGIC)] != RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    if len(payload) < _RAWV_HDR_LEN:
        raise ValueError("truncated RAWV header")
    _, ver, w, h, n, fps = struct.unpack_from(_RAWV_HDR, payload)
    if ver != 1:
        raise ValueError(f"unsupported RAWV version {ver}")
    need = n * h * w
    raw = np.frombuffer(payload, np.uint8, offset=_RAWV_HDR_LEN)
    if raw.size < need:
        raise ValueError(
            f"truncated RAWV pixel data: {raw.size} bytes < {need}"
        )
    return w, h, n, fps, raw[:need].reshape(n, h, w)


def _codec_video_frames(payload: bytes) -> "tuple | None":
    """Compressed-codec splice point, the video twin of _pil_decode /
    _soundfile_decode: decode mp4/webm/... into grayscale frames via
    the optional imageio(+ffmpeg) or av libraries when installed
    (neither ships in the engine container; production clusters add
    one). Returns (w, h, n_frames, fps, frames (n,h,w) uint8) or None
    when no codec library is present or the payload cannot be parsed."""
    import io

    try:
        import numpy as np

        try:
            import av  # type: ignore

            with av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                fps = int(float(stream.average_rate or 30))
                frames = [
                    np.asarray(f.to_ndarray(format="gray"), np.uint8)
                    for f in container.decode(stream)
                ]
        except ImportError:
            import imageio.v3 as iio  # type: ignore

            arr = iio.imread(io.BytesIO(payload), index=None)
            if arr.ndim == 4:  # (n, h, w, c) -> luma
                arr = arr.mean(axis=3)
            frames = [np.asarray(f, np.uint8) for f in arr]
            fps = 30
        if not frames:
            return None
        stack = np.stack(frames)
        n, h, w = stack.shape
        return w, h, n, fps, stack
    except Exception:
        return None


def video_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 30,
    width_col: str | None = None,
    height_col: str | None = None,
    real_decode: bool = False,
) -> DataFrame:
    """mapInPandas video decode operator: binary -> one row per
    SAMPLED frame (every `every_n`-th) with mean intensity and a
    motion score (mean |frame - previous sampled frame|, 0 for the
    first), both normalized to [0,1].

    Three payload sources, mirroring the image/audio operators:

    - metadata-typed raw frames (`width_col`/`height_col` given): the
      blob is n_frames*(w*h) grayscale bytes, n_frames = len // (w*h)
      — the "opaque binary + typed metadata" shape the pipeline brief
      mandates, and what the value oracle pins;
    - RAWV container (self-describing header) — decode_rawv;
    - real_decode=True: compressed video through _codec_video_frames,
      raising NotImplementedError when no codec library is installed.

    Scale shape: one task holds one Arrow batch of blobs; per row the
    sampled frames form one (k, w*h) matrix so intensity/motion are
    vectorized reductions — Python loops run per VIDEO (header parse),
    never per frame or pixel. Rows whose payload holds no complete
    frame contribute no output rows (same contract as
    frame_sample_plan)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    typed_meta = width_col is not None and height_col is not None
    if (width_col is None) != (height_col is None):
        raise ValueError("pass both width_col and height_col, or neither")

    cols = [F.col(id_col), F.col(payload_col)]
    if typed_meta:
        cols += [F.col(width_col), F.col(height_col)]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, ws, hs, means, motions = [], [], [], [], [], []
            # per-row header/metadata parse (cheap); pixel math is
            # batched below over one concatenated gather matrix
            frames_per_row: list = []  # (media_id, w, h, sampled_idx, (k, wh) u8)
            for j in range(len(pdf)):
                payload = bytes(pdf[payload_col].iloc[j])
                mid = int(pdf[id_col].iloc[j])
                if payload[: len(RAWV_MAGIC)] == RAWV_MAGIC:
                    w, h, n, _fps, arr = decode_rawv(payload)
                elif typed_meta:
                    w = int(pdf[width_col].iloc[j])
                    h = int(pdf[height_col].iloc[j])
                    if w <= 0 or h <= 0:
                        raise ValueError(f"bad frame dims {w}x{h}")
                    n = len(payload) // (w * h)
                    arr = np.frombuffer(
                        payload, np.uint8, count=n * w * h
                    ).reshape(n, h, w)
                elif real_decode:
                    decoded = _codec_video_frames(payload)
                    if decoded is None:
                        raise NotImplementedError(
                            "compressed video codecs need the optional "
                            "imageio/av libraries (absent or could not "
                            "parse this payload); RAWV and raw+metadata "
                            "payloads decode natively"
                        )
                    w, h, n, _fps, arr = decoded
                else:
                    raise ValueError(
                        "payload is not RAWV and no width_col/height_col "
                        "metadata was given (pass real_decode=True for "
                        "compressed containers)"
                    )
                if n < 1:
                    continue
                sel = np.arange(0, n, every_n)
                frames_per_row.append(
                    (mid, w, h, sel, arr[sel].reshape(sel.size, -1))
                )
            if not frames_per_row:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series([], dtype="int64"),
                        "frame_idx": pd.Series([], dtype="int32"),
                        "width": pd.Series([], dtype="int32"),
                        "height": pd.Series([], dtype="int32"),
                        "mean_intensity": pd.Series([], dtype="float64"),
                        "motion": pd.Series([], dtype="float64"),
                    }
                )
                continue
            for mid, w, h, sel, mat in frames_per_row:
                k = sel.size
                f64 = mat.astype(np.float64)
                ids.append(np.full(k, mid, np.int64))
                idxs.append(sel.astype(np.int32))
                ws.append(np.full(k, w, np.int32))
                hs.append(np.full(k, h, np.int32))
                means.append(f64.mean(axis=1) / 255.0)
                mo = np.zeros(k, np.float64)
                if k > 1:
                    mo[1:] = np.abs(np.diff(f64, axis=0)).mean(axis=1) / 255.0
                motions.append(mo)
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(ids),
                    "frame_idx": np.concatenate(idxs),
                    "width": np.concatenate(ws),
                    "height": np.concatenate(hs),
                    "mean_intensity": np.concatenate(means),
                    "motion": np.concatenate(motions),
                }
            )

    return df.select(*cols).mapInPandas(_decode, VIDEO_FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, src_w int, src_h int, out_w int, out_h int, "
    "pixels array<int>"
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    width_col: str | None = None,
    height_col: str | None = None,
) -> DataFrame:
    """mapInPandas image resize (the brief's decode/feature/resize/
    frame-sample quartet): binary payload -> nearest-neighbor
    grayscale thumbnail, returned as a row-major array<int> in
    [0,255] so downstream similarity/dedup ops (and the value oracle)
    consume it without touching binary again.

    Payload sources: PPM/PGM (decode_ppm, RGB averaged to luma),
    RAWV (frame 0), or - with width_col/height_col metadata - a raw
    grayscale blob (first frame when the blob holds several).
    Nearest-neighbor is the deliberate choice: integer-exact and
    engine-portable (src pixel = (r*src_h)//out_h, (c*src_w)//out_w),
    where bilinear would introduce float rounding the oracle cannot
    replay; swap the gather line for cv2/PIL interpolation in
    production, the operator shape is unchanged. Images smaller than
    1x1 never occur (decoders reject); payloads shorter than one raw
    frame yield no row, matching the video operator's contract."""
    import numpy as np  # noqa: F401  (used in the closure)

    if out_w < 1 or out_h < 1:
        raise ValueError(f"out dims must be >= 1, got {out_w}x{out_h}")
    typed_meta = width_col is not None and height_col is not None
    if (width_col is None) != (height_col is None):
        raise ValueError("pass both width_col and height_col, or neither")
    cols = [F.col(id_col), F.col(payload_col)]
    if typed_meta:
        cols += [F.col(width_col), F.col(height_col)]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rs = np.arange(out_h)
        cs = np.arange(out_w)
        magic = RAWV_MAGIC

        def _thumb_one(gray, w, h):
            src_r = (rs * h) // out_h
            src_c = (cs * w) // out_w
            return gray[np.ix_(src_r, src_c)].reshape(-1).astype(np.int32)

        for pdf in batches:
            n = len(pdf)
            payloads = pdf[payload_col].to_numpy()
            ids_in = pdf[id_col].to_numpy()
            if typed_meta:
                ws_in = pdf[width_col].to_numpy()
                hs_in = pdf[height_col].to_numpy()
            # out_px[j] stays None for dropped rows; assembled in input
            # order at the end so the fast path never reorders output.
            out_px: list = [None] * n
            out_w_h: list = [None] * n
            # raw-blob rows bucketed by (w, h): same-dimension frames
            # stack into one (B, h*w) matrix and resize with a single
            # fancy-index instead of a per-image Python loop (round-8
            # perf fix — the bench batch is 100% constant-dim raw, so
            # the whole batch is one numpy gather).
            raw_groups: dict = {}
            for j in range(n):
                payload = bytes(payloads[j])
                head2 = payload[:2]
                if head2 in (b"P6", b"P5"):
                    w, h, _ch, mat = decode_ppm(payload)
                    # rint, not a bare cast: decode_ppm normalizes to
                    # [0,1] and x/255*255 can land epsilon below x in
                    # float32, which a truncating cast would off-by-one
                    gray = np.rint(mat.mean(axis=2) * 255.0).astype(np.uint8)
                    out_px[j] = _thumb_one(gray, w, h)
                    out_w_h[j] = (w, h)
                elif payload[: len(magic)] == magic:
                    w, h, k, _fps, frames = decode_rawv(payload)
                    if k < 1:
                        continue
                    out_px[j] = _thumb_one(frames[0], w, h)
                    out_w_h[j] = (w, h)
                elif typed_meta:
                    w = int(ws_in[j])
                    h = int(hs_in[j])
                    if w <= 0 or h <= 0:
                        raise ValueError(f"bad frame dims {w}x{h}")
                    if len(payload) < w * h:
                        continue
                    idxs, bufs = raw_groups.setdefault((w, h), ([], []))
                    idxs.append(j)
                    bufs.append(payload[: w * h])
                else:
                    raise ValueError(
                        "payload is not PPM/PGM/RAWV and no "
                        "width_col/height_col metadata was given"
                    )
            for (w, h), (idxs, bufs) in raw_groups.items():
                mat = np.frombuffer(b"".join(bufs), np.uint8).reshape(
                    len(idxs), h, w
                )
                src_r = (rs * h) // out_h
                src_c = (cs * w) // out_w
                flat = ((src_r[:, None] * w) + src_c[None, :]).reshape(-1)
                thumbs = mat.reshape(len(idxs), h * w)[:, flat].astype(
                    np.int32
                )
                for t, j in enumerate(idxs):
                    out_px[j] = thumbs[t]
                    out_w_h[j] = (w, h)
            keep = [j for j in range(n) if out_px[j] is not None]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(
                        [int(ids_in[j]) for j in keep], dtype="int64"
                    ),
                    "src_w": pd.Series(
                        [out_w_h[j][0] for j in keep], dtype="int32"
                    ),
                    "src_h": pd.Series(
                        [out_w_h[j][1] for j in keep], dtype="int32"
                    ),
                    "out_w": pd.Series([out_w] * len(keep), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(keep), dtype="int32"),
                    "pixels": pd.Series(
                        [out_px[j] for j in keep], dtype="object"
                    ),
                }
            )

    return df.select(*cols).mapInPandas(_resize, RESIZED_SCHEMA)
