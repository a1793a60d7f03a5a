"""Result serialization + metadata endpoints (the HTTP tier of the engine)."""

from carbonapi_spark.render.serialize import (
    SeriesResult, collect_series, render_csv, render_json, render_pickle,
    render_raw,
)

__all__ = ["SeriesResult", "collect_series", "render_json", "render_csv",
           "render_raw", "render_pickle"]
