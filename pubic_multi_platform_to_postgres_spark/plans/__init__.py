"""Logical-plan-side components: schema compilation, stream catalog, views."""
