"""yomitoku_spark — a from-scratch, PySpark-native main-content extraction
engine with the query/data-processing capabilities of
``kotaro-kinoshita/yomitoku`` (reference snapshot at /root/reference, studied
for behavior only — no code copied; the reference is a single-node Python/
PyTorch document-AI pipeline, this is a distributed Spark DataFrame engine).

Input contract (BASELINE.json → input_hint)::

    transcripts(conv_id: string, turn_idx: int, role: string,
                text: string, tool: string, ts: timestamp)

Flagship API::

    from yomitoku_spark import extract
    result = extract(transcripts_df)   # fused single-stage path, no shuffle

Staged (inspectable) API lives in :mod:`yomitoku_spark.plans.pipeline`.
"""

from yomitoku_spark.plans.pipeline import extract, extract_staged  # noqa: F401
from yomitoku_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
