from jckx.logging.main_logger import MainLogger  # noqa: F401
from jckx.logging.utils import time_to_str  # noqa: F401
