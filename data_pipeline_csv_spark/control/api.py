"""FastAPI control plane (reference C1-C5, api.py:102-584).

Endpoints mirror the reference: run launcher returning immediately
with a run_id, status poll, history (sorted desc) + clear, file
catalog, preview and stats over the warehouse table, and the
single-page dashboard on ``GET /`` (an original page with the
reference's feature set — see control/dashboard.py).

FastAPI is optional in this environment; import this module only when
fastapi is installed (``create_app`` raises otherwise).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from ..engine import PipelineEngine
from .dashboard import dashboard_html
from .state import RunRegistry, execute_run, run_as_dict

try:  # gated: fastapi isn't part of the baked environment
    from fastapi import BackgroundTasks, FastAPI, HTTPException
except ImportError:  # pragma: no cover
    FastAPI = None  # type: ignore[assignment]


def create_app(engine: PipelineEngine, data_dir: str, table_name: str = "products"):
    if FastAPI is None:
        raise ImportError("fastapi is not installed; the control-plane API is unavailable")

    app = FastAPI(title="data_pipeline_csv_spark")
    registry = RunRegistry()
    pool = ThreadPoolExecutor(max_workers=4)

    @app.get("/", include_in_schema=False)
    def dashboard():
        from fastapi.responses import HTMLResponse

        return HTMLResponse(dashboard_html(table_name))

    @app.post("/api/pipeline/run")
    def run_pipeline(csv_path: str | None = None, background_tasks: BackgroundTasks = None):
        source = csv_path or os.path.join(data_dir, "products.csv")
        if not os.path.exists(source):
            raise HTTPException(status_code=400, detail=f"Source not found: {source}")
        run = registry.create({"csv_path": source, "table": table_name})

        def _job() -> int:
            result = engine.run_pipeline(source, table_name)
            return result.rows_written

        pool.submit(execute_run, registry, run.run_id, _job)
        return {"run_id": run.run_id, "status": "started"}

    @app.get("/api/pipeline/status/{run_id}")
    def status(run_id: str):
        run = registry.get(run_id)
        if run is None:
            raise HTTPException(status_code=404, detail="Run not found")
        return run_as_dict(run)

    @app.get("/api/pipeline/runs")
    def runs():
        return [run_as_dict(r) for r in registry.all()]

    @app.delete("/api/pipeline/runs")
    def clear():
        return {"cleared": registry.clear()}

    @app.get("/api/files/list")
    def files():
        out = []
        if os.path.isdir(data_dir):
            for name in sorted(os.listdir(data_dir)):
                full = os.path.join(data_dir, name)
                if name.lower().endswith(".csv") and os.path.isfile(full):
                    size = os.path.getsize(full)
                    out.append({"name": name, "size_bytes": size, "size_mb": round(size / 1e6, 3)})
        return {"files": out}

    @app.get("/api/data/preview")
    def preview(limit: int = 10):
        if not engine.table_exists(table_name):
            raise HTTPException(status_code=404, detail="Table not found")
        return {"table": table_name, "rows": engine.preview(table_name, limit)}

    @app.get("/api/data/stats")
    def stats():
        if not engine.table_exists(table_name):
            raise HTTPException(status_code=404, detail="Table not found")
        return engine.stats(table_name)

    return app
