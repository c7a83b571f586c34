"""Extraction-side components: REST sources, state/bookmarks, transports."""
