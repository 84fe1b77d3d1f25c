"""Multimodal column plumbing (SURVEY.md §2.3): image/audio/video as opaque
`binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas`.

The Spark-side machinery — schema, batch iteration, partition sizing, UDF
signatures — is real and tested.  The actual codecs (PIL/ffmpeg/soundfile)
are NOT in this container, so decode is a clearly marked stub: by default it
raises NotImplementedError; with `fake=True` it derives deterministic
pseudo-features from the bytes so the pipeline shape can be exercised and
oracle-checked end-to-end.

At 100 TB: binary payloads dominate row size — keep them in their own
parquet column (never in join keys), size `spark.sql.files.maxPartitionBytes`
so a batch of payloads fits executor memory, and project the payload away
immediately after feature extraction (the returned frame drops it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, width long, height long, checksum long"
)



def _make_null_payload_guard():
    def _reject_null_payloads(pdf) -> None:
        """Shared null-payload guard for every multimodal verb — one copy,
        one diagnostic (the three inline copies had already drifted apart;
        code-review r4, operators pass)."""
        bad = pdf["asset_id"][pdf["payload"].isna()]
        if len(bad):
            raise ValueError(
                "null payload for asset_id(s) "
                f"{sorted(bad.head(5).tolist())} — filter or impute "
                "before media processing (code-review r4: None used to "
                "surface as an opaque TypeError inside a worker task)"
            )

    return _reject_null_payloads


# WORKER-SAFE sharing: built via the factory so its __qualname__ contains
# <locals> and cloudpickle serializes it BY VALUE into each mapInPandas
# closure.  A plain module-level def is pickled by REFERENCE, which requires
# this package importable inside every Python worker — the driver-only
# importability contract (tests/test_cwd_independence.py) then breaks with
# ModuleNotFoundError in the worker (caught by the final r4 full-suite run).
_reject_null_payloads = _make_null_payload_guard()


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Input schema: sources.schemas.MEDIA_SCHEMA (asset_id, media_type,
    payload binary, ...).  Output: FEATURE_SCHEMA, payload projected away.
    Arrow moves the binary column zero-copy into pandas; the decode runs
    per-batch in Python, the only place Python belongs in this engine.
    """
    # Bind the decode behavior into the closure (not a module-level function
    # reference): cloudpickle ships closures by value, so the UDF runs on
    # workers that cannot import this package (driver launched from another
    # cwd, cluster without the repo on PYTHONPATH).
    if fake:
        def decode(payload: bytes, media_type: str) -> tuple[int, int]:
            n = len(payload)
            return (n % 640, (n * 7) % 480)
    else:
        def decode(payload: bytes, media_type: str) -> tuple[int, int]:
            # the real-codec boundary: images decode through PIL when the
            # environment provides it (the env-gated integration test
            # lights up automatically then — VERDICT r3 item #6); anything
            # else still fails loudly rather than fabricating features
            if media_type.startswith("image/"):
                try:
                    import io

                    from PIL import Image
                except ImportError as exc:
                    raise NotImplementedError(
                        "image decode needs PIL, which is not available in "
                        "this environment; run with fake=True for the "
                        "deterministic stub"
                    ) from exc
                with Image.open(io.BytesIO(bytes(payload))) as im:
                    return im.size
            raise NotImplementedError(
                f"no codec for media_type={media_type!r} (audio/video need "
                "ffmpeg/soundfile, absent here); run with fake=True for the "
                "deterministic stub"
            )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _reject_null_payloads(pdf)
            dims = [decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    # cheap integrity checksum: first/last byte + length mix
                    "checksum": [
                        (len(p) + (p[0] if len(p) else 0) * 31 + (p[-1] if len(p) else 0))
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(features, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_no long, frame_bytes long, frame_md5 string"


def sample_frames(
    media: DataFrame, frame_size: int = 64, every: int = 2, fake: bool = False
) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    ``frame_size``-byte frames, keep every ``every``-th, one output row per
    kept frame — mapInPandas with a row-multiplying output, the shape a real
    video frame-sampler (ffmpeg keyframe extraction) drops into.

    The codec is the stub (module docstring): ``fake=True`` treats the
    payload itself as the frame stream so the plumbing — batch iteration,
    per-asset explosion, binary slicing, digest — is exercised and
    oracle-checked; without it this raises like the other codec paths.
    Frames are emitted as (length, md5) digests: at scale you return the
    frame bytes for downstream encode, but never carry them past the stage
    that consumes them."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/soundfile) are not available in this "
            "environment; run with fake=True for the deterministic stub"
        )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            _reject_null_payloads(pdf)
            ids, nos, sizes, digests = [], [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(p)
                # ceil, NOT max(1, ceil): an empty payload has ZERO frames
                # — the floor fabricated a phantom (frame_no=0, 0 bytes,
                # md5(b'')) row per empty asset (code-review r4, operators
                # pass; oracle updated in lockstep)
                n_frames = math.ceil(len(p) / frame_size)
                for fi in range(0, n_frames, every):
                    chunk = p[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(aid)
                    nos.append(fi)
                    sizes.append(len(chunk))
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": nos, "frame_bytes": sizes, "frame_md5": digests}
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "asset_id long, n_in long, n_out long, out_md5 string"


def resize_media(
    media: DataFrame, target_bytes: int = 256, fake: bool = False
) -> DataFrame:
    """Resize/downsample over binary payloads — the third multimodal verb
    (decode / feature-extract / RESIZE / frame-sample).  A real
    implementation decodes, rescales (image resize, audio downsample), and
    re-encodes inside the same Arrow batch; the codec stub (module
    docstring) instead strides the byte stream — every ``step``-th byte
    with step = ceil(n/target) — the exact shape of nearest-neighbor
    downsampling, deterministic and oracle-checkable.  Output carries
    (in-size, out-size, digest); at scale you return the resized payload to
    the next stage and never carry it further."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/soundfile) are not available in this "
            "environment; run with fake=True for the deterministic stub"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            _reject_null_payloads(pdf)
            ids, n_ins, n_outs, digests = [], [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(p)
                step = max(1, math.ceil(len(p) / target_bytes))
                out = p[::step]
                ids.append(aid)
                n_ins.append(len(p))
                n_outs.append(len(out))
                digests.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "n_in": n_ins, "n_out": n_outs, "out_md5": digests}
            )

    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table as a media table (utf-8 payload),
    so the multimodal plumbing is exercised against real testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("meta_source"),
        # actual UTF-8 byte length, NOT n_chars: they diverge on any
        # non-ASCII text, and meta_bytes must agree with the payload's
        # real length (code-review r4)
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("meta_bytes"),
    )
