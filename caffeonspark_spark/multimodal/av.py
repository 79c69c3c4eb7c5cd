"""Audio/video multimodal columns: opaque binary + typed metadata.

The north-star extension alongside images (SURVEY.md §1.4): treat
audio/video payloads as ``binary`` columns wrapped in typed structs, with
decode / feature-extract / frame-sample as Arrow-batched operators over
``mapInPandas``. No media codec ships in this container, so the byte→signal
decode step is STUBbed behind ``NotImplementedError`` with a deterministic
fake — the Spark-side plumbing (struct schemas, UDF signatures, batch
iteration, output shapes) is real and tested, and production only swaps the
decoder callable (ffmpeg/torchaudio/PyAV), exactly like ``columns.decode_image``.

Scale posture: one linear ``mapInPandas`` pass per operator — no shuffle, no
driver collect; payload bytes stay in Arrow buffers end to end. At 100 TB the
same plans run over binaryFile/parquet sources with the decode UDF as the
only Python stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# audio payload + typed metadata (sample_rate/n_samples = the dims columns
# of the image tuple, applied to the time axis)
AUDIO_STRUCT_SCHEMA = T.StructType(
    [
        T.StructField("audio", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)

# video payload + typed metadata
VIDEO_STRUCT_SCHEMA = T.StructType(
    [
        T.StructField("video", T.BinaryType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]
)


def audio_struct_col(audio: Column, sample_rate: Column, n_samples: Column) -> Column:
    return F.struct(
        audio.alias("audio"),
        sample_rate.cast("int").alias("sample_rate"),
        n_samples.cast("int").alias("n_samples"),
    )


def video_struct_col(video: Column, n_frames: Column, height: Column, width: Column) -> Column:
    return F.struct(
        video.alias("video"),
        n_frames.cast("int").alias("n_frames"),
        height.cast("int").alias("height"),
        width.cast("int").alias("width"),
    )


# --- decoders (stub + deterministic fake) ---------------------------------

def decode_audio(data: bytes, sample_rate: int) -> np.ndarray:
    """Decode compressed audio bytes → float32 waveform in [-1, 1].

    STUB: no audio codec in this container; wire torchaudio/soundfile/ffmpeg
    here in production. Callers are codec-agnostic.
    """
    raise NotImplementedError(
        "no audio codec in this environment; use fake_decode_audio for tests "
        "or wire soundfile/ffmpeg in production"
    )


def fake_decode_audio(data: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in: tile payload bytes into a float32 waveform in
    [-1, 1). Pure function of the bytes — reproducible tests."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    wave = np.resize(buf, max(n_samples, 1)).astype(np.float32)
    return (wave - 128.0) / 128.0


def decode_video_frames(data: bytes, n_frames: int, height: int, width: int) -> np.ndarray:
    """Decode video bytes → (n_frames, H, W, C=1) uint8. STUB, as above."""
    raise NotImplementedError(
        "no video codec in this environment; use fake_decode_video for tests "
        "or wire PyAV/ffmpeg in production"
    )


def fake_decode_video(data: bytes, n_frames: int, height: int, width: int) -> np.ndarray:
    """Deterministic stand-in: tile bytes into (n_frames, H, W, 1) uint8."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    need = max(n_frames, 1) * height * width
    return np.resize(buf, need).reshape(max(n_frames, 1), height, width, 1)


# --- operators (mapInPandas, Arrow-batched) -------------------------------

def audio_frame_energy(
    df: DataFrame,
    audio_col: str = "audio_meta",
    id_col: str = "id",
    frame_len: int = 256,
    n_frames: int = 16,
    decoder=fake_decode_audio,
) -> DataFrame:
    """Per-clip frame-energy feature vector: decode → frame the waveform →
    RMS per frame → ``array<float>`` of length ``n_frames``.

    Output: ``(id, energy: array<float>, sample_rate: int)``. This is the
    audio twin of image feature extraction — the plumbing a real
    MFCC/fbank featurizer drops into.
    """

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, feats, rates = [], [], []
            for _, row in pdf.iterrows():
                meta = row[audio_col]
                wave = decoder(bytes(meta["audio"]), int(meta["n_samples"]))
                need = frame_len * n_frames
                w = np.resize(wave.astype(np.float64), need).reshape(n_frames, frame_len)
                rms = np.sqrt((w * w).mean(axis=1)).astype(np.float32)
                ids.append(row[id_col])
                feats.append(rms)
                rates.append(int(meta["sample_rate"]))
            yield pd.DataFrame({"id": ids, "energy": feats, "sample_rate": rates})

    return df.mapInPandas(run, "id long, energy array<float>, sample_rate int")


def video_sample_frames(
    df: DataFrame,
    video_col: str = "video_meta",
    id_col: str = "id",
    k: int = 4,
    decoder=fake_decode_video,
) -> DataFrame:
    """Uniform frame sampling: decode → pick ``k`` evenly-spaced frames →
    one output row PER FRAME with the frame bytes + dims (explode-shaped, so
    downstream image operators apply unchanged).

    Output: ``(id, frame_idx, frame: binary, height, width)``.
    """

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, idxs, frames, hs, ws = [], [], [], [], []
            for _, row in pdf.iterrows():
                meta = row[video_col]
                nf, h, w = int(meta["n_frames"]), int(meta["height"]), int(meta["width"])
                clip = decoder(bytes(meta["video"]), nf, h, w)
                pick = np.linspace(0, max(nf - 1, 0), num=min(k, max(nf, 1)), dtype=np.int64)
                for fi in pick:
                    ids.append(row[id_col])
                    idxs.append(int(fi))
                    frames.append(clip[fi].tobytes())
                    hs.append(h)
                    ws.append(w)
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame": frames, "height": hs, "width": ws}
            )

    return df.mapInPandas(run, "id long, frame_idx int, frame binary, height int, width int")
