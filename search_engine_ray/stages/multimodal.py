"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample stages over opaque ``binary`` payload columns.

All three decode kernels are REAL in this container via stdlib-only
codecs, with a full codec library used instead when importable:

* image — Pillow if importable, else the pure-stdlib PNG decoder in
  :mod:`.png` (zlib inflate + unfilter);
* video — pyav if importable, else the pure-stdlib animated-GIF decoder
  in :mod:`.gif` (LZW + compositing);
* audio — soundfile if importable, else stdlib ``wave`` (RIFF/WAVE PCM).

Payload formats outside what the active codec can handle raise
``ValueError`` naming the library that would decode them.  ``fake=True``
swaps in a deterministic fake decode (seeded from the payload hash) for
plumbing tests that don't want to carry media fixtures.

Scale notes baked into the design:
* payload batches are kept in ``batch_format="pyarrow"`` (binary columns
  don't round-trip pandas well);
* decode stages are actor pools (codec init once per actor) with SMALL
  ``batch_size`` — a batch of B payloads × decoded size must fit the
  worker heap;
* decoded tensors are emitted as fixed-size ``list<float>`` columns so
  downstream stages stay zero-copy Arrow.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa


def _fake_pixels(payload: bytes, shape: Tuple[int, ...]) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=8).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    return rng.random(shape, dtype=np.float32)


class ImageDecodeStage:
    """binary image payload → (H, W, 3) float tensor (flattened).

    ``fake=False`` uses Pillow when it is importable (decode + RGB
    convert + resize, any format Pillow knows); without Pillow it falls
    back to the pure-stdlib PNG decoder in :mod:`.png` (zlib inflate +
    unfilter + nearest-neighbor resize) — a REAL decode path that runs
    in this container.  Non-PNG payloads on the fallback path raise
    ``ValueError`` per batch, naming the codec that would handle them.
    """

    def __init__(
        self,
        height: int = 32,
        width: int = 32,
        payload_column: str = "payload",
        fake: bool = False,
    ):
        self.h, self.w = height, width
        self.payload_column = payload_column
        self.fake = fake
        self._pil = None
        if not fake:
            try:
                from PIL import Image  # noqa: PLC0415

                self._pil = Image
            except ImportError:
                self._pil = None  # stdlib PNG fallback

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.fake:
            return _fake_pixels(payload, (self.h, self.w, 3))
        import io  # noqa: PLC0415

        if self._pil is not None:
            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.w, self.h))
            return np.asarray(img, dtype=np.float32) / np.float32(255.0)
        from .png import decode_png, to_rgb  # noqa: PLC0415

        if not payload or not payload.startswith(b"\x89PNG"):
            raise ValueError(
                "non-PNG payload on the stdlib decode path; JPEG/WebP/"
                "GIF need Pillow (not in this container)"
            )
        rgb = to_rgb(decode_png(payload))
        ih, iw = rgb.shape[:2]
        ys = (np.arange(self.h) * ih // self.h).astype(np.int64)
        xs = (np.arange(self.w) * iw // self.w).astype(np.int64)
        resized = rgb[ys[:, None], xs[None, :]]
        return resized.astype(np.float32) / np.float32(255.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors = [
            self._decode(p).reshape(-1).tolist()
            for p in batch[self.payload_column].to_pylist()
        ]
        return batch.drop_columns([self.payload_column]).append_column(
            "pixels", pa.array(tensors, pa.list_(pa.float32()))
        )


class ImageResizeStage:
    """(H*W*3) pixels → (h*w*3) via vectorized nearest-neighbor resample
    (a real kernel — no codec needed)."""

    def __init__(self, in_hw: Tuple[int, int], out_hw: Tuple[int, int]):
        self.ih, self.iw = in_hw
        self.oh, self.ow = out_hw
        ys = (np.arange(self.oh) * self.ih // self.oh).astype(np.int64)
        xs = (np.arange(self.ow) * self.iw // self.ow).astype(np.int64)
        self.index = (ys[:, None] * self.iw + xs[None, :]).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for px in batch["pixels"].to_pylist():
            img = np.asarray(px, dtype=np.float32).reshape(
                self.ih * self.iw, 3
            )
            out.append(img[self.index].reshape(-1).tolist())
        i = batch.schema.get_field_index("pixels")
        return batch.set_column(
            i, "pixels", pa.array(out, pa.list_(pa.float32()))
        )


class ImageFeatureStage:
    """pixels → small feature vector (channel means/stds + 4x4 luma grid);
    a stand-in for a model-backed embedder (which would load its weights
    here in __init__, once per actor)."""

    def __init__(self, hw: Tuple[int, int]):
        self.h, self.w = hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for px in batch["pixels"].to_pylist():
            img = np.asarray(px, dtype=np.float32).reshape(self.h, self.w, 3)
            luma = img.mean(axis=2)
            gh, gw = self.h // 4, self.w // 4
            grid = luma[: gh * 4, : gw * 4].reshape(4, gh, 4, gw).mean(axis=(1, 3))
            f = np.concatenate(
                [img.mean(axis=(0, 1)), img.std(axis=(0, 1)), grid.reshape(-1)]
            )
            feats.append(f.astype(np.float32).tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


class VideoFrameSampleStage:
    """binary video payload → ``n_frames`` frames sampled evenly across
    the clip, each decoded to a small pixel tensor.  Emits one ROW PER
    FRAME (flat_map-shaped: frame_index + pixels), the layout a
    downstream per-frame embedder expects.

    ``fake=False`` uses pyav when importable (any container ffmpeg
    knows); without it, the pure-stdlib animated-GIF decoder in
    :mod:`.gif` — a REAL decode path that runs in this container.
    Non-GIF payloads on the fallback path raise ``ValueError`` naming
    the codec that would handle them."""

    def __init__(
        self,
        n_frames: int = 4,
        height: int = 16,
        width: int = 16,
        payload_column: str = "payload",
        fake: bool = False,
    ):
        self.n_frames = n_frames
        self.h, self.w = height, width
        self.payload_column = payload_column
        self.fake = fake
        self._av = None
        if not fake:
            try:
                import av  # noqa: PLC0415

                self._av = av
            except ImportError:
                self._av = None  # stdlib GIF fallback

    def _resize(self, rgb: np.ndarray) -> np.ndarray:
        ih, iw = rgb.shape[:2]
        ys = (np.arange(self.h) * ih // self.h).astype(np.int64)
        xs = (np.arange(self.w) * iw // self.w).astype(np.int64)
        return (
            rgb[ys[:, None], xs[None, :]].astype(np.float32)
            / np.float32(255.0)
        )

    def _decode_frames(self, payload: bytes) -> list:
        """→ list of n_frames (h, w, 3) float32 tensors."""
        if self.fake:
            return [
                _fake_pixels(
                    (payload or b"") + f.to_bytes(4, "big"),
                    (self.h, self.w, 3),
                )
                for f in range(self.n_frames)
            ]
        if self._av is not None:
            import io  # noqa: PLC0415

            # resize each frame AS IT STREAMS: retaining full-resolution
            # ndarrays for a long clip would OOM the worker (a 2-min
            # 1080p30 clip is ~22 GB raw); resized thumbnails are ~3 KB
            frames = []
            with self._av.open(io.BytesIO(payload)) as container:
                for frame in container.decode(video=0):
                    frames.append(
                        self._resize(frame.to_ndarray(format="rgb24"))
                    )
            if not frames:
                raise ValueError("video payload decoded to zero frames")
            picks = np.round(
                np.linspace(0, len(frames) - 1, self.n_frames)
            ).astype(np.int64)
            return [frames[i] for i in picks]
        if not payload or not payload.startswith((b"GIF87a", b"GIF89a")):
            raise ValueError(
                "non-GIF payload on the stdlib decode path; mp4/webm/"
                "mkv need pyav/ffmpeg (not in this container)"
            )
        from .gif import iter_gif_frames  # noqa: PLC0415

        # same streaming-resize discipline as the pyav path
        frames = [self._resize(f) for f in iter_gif_frames(payload)]
        if not frames:
            raise ValueError("video payload decoded to zero frames")
        # sample n_frames evenly across the clip (repeats when short)
        picks = np.round(
            np.linspace(0, len(frames) - 1, self.n_frames)
        ).astype(np.int64)
        return [frames[i] for i in picks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        other_cols = [
            c for c in batch.column_names if c != self.payload_column
        ]
        out = {c: [] for c in other_cols}
        out["frame_index"] = []
        out["pixels"] = []
        for i, payload in enumerate(batch[self.payload_column].to_pylist()):
            for f, tensor in enumerate(self._decode_frames(payload)):
                for c in other_cols:
                    out[c].append(batch[c][i].as_py())
                out["frame_index"].append(f)
                out["pixels"].append(tensor.reshape(-1).tolist())
        # carried columns keep the INPUT schema's types (inference from
        # Python values would give null-typed columns on an empty batch
        # and can widen types, breaking schema unification across blocks)
        arrays = {
            c: pa.array(v, type=batch.schema.field(c).type)
            for c, v in out.items()
            if c in batch.column_names
        }
        arrays["frame_index"] = pa.array(out["frame_index"], pa.int32())
        arrays["pixels"] = pa.array(out["pixels"], pa.list_(pa.float32()))
        return pa.table(arrays)


class AudioFrameSampleStage:
    """binary audio payload → per-window RMS energies (``n_frames``
    equal windows across the clip).

    ``fake=False`` uses soundfile when importable (any libsndfile
    format); without it, stdlib ``wave`` decodes RIFF/WAVE PCM (8/16/32
    bit, any channel count, mixed to mono) — a REAL decode path that
    runs in this container.  Non-WAV payloads on the fallback path
    raise ``ValueError`` naming the codec that would handle them."""

    def __init__(
        self,
        n_frames: int = 16,
        payload_column: str = "payload",
        fake: bool = False,
    ):
        self.n_frames = n_frames
        self.payload_column = payload_column
        self.fake = fake
        self._sf = None
        if not fake:
            try:
                import soundfile  # noqa: PLC0415

                self._sf = soundfile
            except ImportError:
                self._sf = None  # stdlib wave fallback

    def _samples(self, payload: bytes) -> np.ndarray:
        """→ mono float32 samples in [-1, 1]."""
        import io  # noqa: PLC0415

        if self._sf is not None:
            data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
            return data.mean(axis=1) if data.ndim > 1 else data
        if not payload or not payload.startswith(b"RIFF"):
            raise ValueError(
                "non-WAV payload on the stdlib decode path; mp3/flac/ogg "
                "need soundfile/ffmpeg (not in this container)"
            )
        import wave  # noqa: PLC0415

        with wave.open(io.BytesIO(payload), "rb") as wf:
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
        if width == 1:  # unsigned 8-bit
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif width == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif width == 4:
            x = (
                np.frombuffer(raw, dtype="<i4").astype(np.float32)
                / 2147483648.0
            )
        else:
            raise ValueError(f"unsupported WAV sample width {width}")
        if n_ch > 1:
            x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
        return x

    def _energies(self, payload: bytes) -> list:
        if self.fake:
            return _fake_pixels(payload, (self.n_frames,)).tolist()
        x = self._samples(payload)
        if len(x) == 0:
            return [0.0] * self.n_frames
        edges = np.linspace(0, len(x), self.n_frames + 1).astype(np.int64)
        # per-window RMS via cumulative sum of squares (vectorized)
        csq = np.concatenate([[0.0], np.cumsum(x.astype(np.float64) ** 2)])
        counts = np.maximum(edges[1:] - edges[:-1], 1)
        rms = np.sqrt((csq[edges[1:]] - csq[edges[:-1]]) / counts)
        return rms.astype(np.float32).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = [
            self._energies(p)
            for p in batch[self.payload_column].to_pylist()
        ]
        return batch.drop_columns([self.payload_column]).append_column(
            "frame_energy", pa.array(frames, pa.list_(pa.float32()))
        )
