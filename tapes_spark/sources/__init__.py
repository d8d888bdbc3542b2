from tapes_spark.sources.transcript_jsonl import read_transcript_jsonl  # noqa: F401
from tapes_spark.sources.export import export_conversations  # noqa: F401
