"""Interactive demo (stdlib HTTP server; the reference ships a streamlit app,
which is not installed in this image — same capability, zero extra deps)."""
