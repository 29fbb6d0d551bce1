from coltt_tpu.utils.snowflake import SnowflakeNode
from coltt_tpu.utils.logging import get_logger
from coltt_tpu.utils.config import Config, load_config

__all__ = ["SnowflakeNode", "get_logger", "Config", "load_config"]
