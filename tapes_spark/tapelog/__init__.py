from tapes_spark.tapelog.table import TapeTable  # noqa: F401
from tapes_spark.tapelog.writer import SinkWriter  # noqa: F401
from tapes_spark.tapelog.incremental import IncrementalDeriver  # noqa: F401
