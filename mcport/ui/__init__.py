"""UI tier (optional). ``streamlit run mcport/ui/app.py`` launches the parity app.

Import-gated: streamlit/plotly are optional dependencies absent from minimal
installs; nothing in the library/CLI tiers imports this package.
"""
