"""Shared utilities (currently empty: per-pass observability lives in
render.integrator.TraceStats + render.pipeline.render_with_stats)."""
