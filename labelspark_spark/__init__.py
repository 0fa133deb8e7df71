"""labelspark_spark — a PySpark-native analytics engine with the
capability surface of Labelbox/labelspark, rebuilt Spark-first and
extended with training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns, streaming).

Reference: /root/reference (read-only); design notes in SURVEY.md.
"""

from labelspark_spark.client import Client, LocalTransport
from labelspark_spark.session import get_spark_session

__version__ = "0.1.0"

__all__ = ["Client", "LocalTransport", "get_spark_session", "__version__"]
