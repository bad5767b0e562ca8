from exastencils_tpu.config.knowledge import Knowledge
from exastencils_tpu.config.settings import Platform, Settings
from exastencils_tpu.config.parser import parse_config_file, parse_config_text, parse_value

__all__ = [
    "Knowledge",
    "Settings",
    "Platform",
    "parse_config_file",
    "parse_config_text",
    "parse_value",
]
