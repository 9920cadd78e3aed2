from .windows import session_agg, sliding_agg, tumbling_agg
from .runner import run_available_now

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "run_available_now"]
