"""Time formatting helper (reference ``logger/utils.py:1-2``)."""


def time_to_str(time_diff: float) -> str:
    h = int(time_diff // 3600)
    m = int(time_diff % 3600 // 60)
    s = time_diff % 60
    return f"{h}h {m}m {s:.1f}s"
