"""Physical operator layer: flatten/unnest/upsert + scale extensions."""
