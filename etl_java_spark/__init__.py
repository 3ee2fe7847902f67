"""etl_java_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference JDBC ETL tool
(RoberWaters/ETL-Java, surveyed in SURVEY.md) as an idiomatic Spark
library, plus the charter's LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns), designed for
100 TB-scale execution.
"""

from .session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
