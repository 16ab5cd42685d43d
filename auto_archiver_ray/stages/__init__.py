"""Batch-transform stages. Each stage is either a plain function (stateless
task) or a callable class (actor pool) intended for
``Dataset.map_batches(..., batch_format="pyarrow")``."""
