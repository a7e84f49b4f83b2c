"""Headless UI execution: run mcport/ui/app.py top-to-bottom with mock
streamlit/plotly modules and real fixture data.

streamlit isn't installed here, but the UI tier's *logic* (session state, data
assembly, all four tabs calling into the engine) is executable — the mocks
return widget defaults, a mocked uploader feeds the fixture CSVs, and every
st.error becomes a test failure. This catches wiring bugs the pure-library
tests can't (the reference app's only 'testing' was manual UI interaction;
this is its automated equivalent).
"""

import runpy
import sys
import types
from contextlib import contextmanager
from pathlib import Path

import pytest

FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"


class _Recorder:
    def __init__(self):
        self.errors = []
        self.charts = 0
        self.tables = 0


def _make_streamlit(rec: _Recorder, upload_paths):
    st = types.ModuleType("streamlit")

    @contextmanager
    def _ctx(*a, **k):
        yield None

    class _Ctx:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Sidebar(types.SimpleNamespace):
        def header(self, *a, **k): pass
        def expander(self, *a, **k): return _Ctx()

    class _UploadFile:
        def __init__(self, path: Path):
            self.name = path.name
            self._fh = open(path, "rb")

        def seek(self, n): self._fh.seek(n)
        def read(self, *a): return self._fh.read(*a)
        def readline(self, *a): return self._fh.readline(*a)
        def __iter__(self): return iter(self._fh)
        def __getattr__(self, item): return getattr(self._fh, item)

    st.session_state = {}
    st.sidebar = _Sidebar()
    st.set_page_config = lambda **k: None
    st.markdown = lambda *a, **k: None
    st.write = lambda *a, **k: rec.__setattr__("tables", rec.tables + 1)
    st.warning = lambda *a, **k: None
    st.success = lambda *a, **k: None
    st.error = lambda *a, **k: rec.errors.append(a[0] if a else "?")
    # real streamlit returns the SAME UploadedFile objects on every rerun
    # until the widget value changes — the reference's per-object dedupe
    # (app.py:385-390) relies on that, so the mock must too. Appending to
    # st.file_uploader_paths simulates the user adding a file (new object).
    st.file_uploader_paths = list(upload_paths)
    _upload_objs = {}

    def _uploader(*a, **k):
        out = []
        for i, path in enumerate(st.file_uploader_paths):
            if i not in _upload_objs:
                _upload_objs[i] = _UploadFile(path)
            out.append(_upload_objs[i])
        return out

    st.file_uploader = _uploader
    st.text_input = lambda *a, **k: ""
    st.date_input = lambda label, value=None, **k: value
    st.button = lambda *a, **k: False
    st.selectbox = lambda label, options, **k: options[0]
    st.number_input = lambda label, value=0.0, **k: value
    st.plotly_chart = lambda *a, **k: rec.__setattr__("charts", rec.charts + 1)
    st.rerun = lambda: None

    class _Form(_Ctx):
        pass

    st.form = lambda *a, **k: _Form()
    st.form_submit_button = lambda *a, **k: False
    st.columns = lambda n, **k: [_Ctx() for _ in range(n if isinstance(n, int) else len(n))]
    st.tabs = lambda labels: [_Ctx() for _ in labels]
    st.expander = lambda *a, **k: _Ctx()
    return st


def _make_plotly():
    plotly = types.ModuleType("plotly")
    go = types.ModuleType("plotly.graph_objects")
    px = types.ModuleType("plotly.express")

    class Figure:
        def __init__(self, *a, **k): self.traces = []
        def add_trace(self, t): self.traces.append(t)
        def update_layout(self, **k): pass

    go.Figure = Figure
    go.Scatter = lambda **k: k
    px.pie = lambda **k: Figure()
    plotly.graph_objects = go
    plotly.express = px
    return plotly, go, px


def test_ui_runs_end_to_end_with_fixture_uploads(monkeypatch):
    rec = _Recorder()
    uploads = [
        FIXTURES / "BTC_USD 7 Years Weekly.csv",
        FIXTURES / "ETH_USD 7 Years Weekly.csv",
    ]
    st = _make_streamlit(rec, uploads)
    plotly, go, px = _make_plotly()
    monkeypatch.setitem(sys.modules, "streamlit", st)
    monkeypatch.setitem(sys.modules, "plotly", plotly)
    monkeypatch.setitem(sys.modules, "plotly.graph_objects", go)
    monkeypatch.setitem(sys.modules, "plotly.express", px)
    sys.modules.pop("mcport.ui.app", None)

    runpy.run_module("mcport.ui.app", run_name="app")

    assert rec.errors == [], f"UI reported errors: {rec.errors}"
    # tab 0 wrote the stats table; tab 2 drew 6 methods x (frontier + pie) plus
    # tab 3 forecast charts for both assets
    assert rec.tables >= 1
    assert rec.charts >= 6 * 2 + 2
    # the uploaded data landed in session state
    assert len(st.session_state["uploaded_dfs"]) == 2

    # reference upload semantics (app.py:385-390 + 441-447): a rerun with the
    # SAME file objects is idempotent; a same-name re-upload is a NEW object
    # and appends a second asset, disambiguated by the Counter suffix
    sys.modules.pop("mcport.ui.app", None)
    runpy.run_module("mcport.ui.app", run_name="app")
    assert len(st.session_state["uploaded_dfs"]) == 2

    st.file_uploader_paths.append(uploads[0])   # re-upload BTC (new object)
    sys.modules.pop("mcport.ui.app", None)
    runpy.run_module("mcport.ui.app", run_name="app")
    assert len(st.session_state["uploaded_dfs"]) == 3
    from mcport.data.pipeline import dedupe_names

    names = dedupe_names([t for t, _ in st.session_state["uploaded_dfs"]])
    assert names[2] == f"{names[0]} (2)"
    assert rec.errors == []


def test_upload_dedupe_survives_object_reconstruction(monkeypatch):
    """Streamlit versions that rebuild UploadedFile wrappers from the stored
    UploadedFileRec on every rerun lose per-object attributes — the app keys
    on the stable file_id there, so a widget-triggered rerun must NOT
    re-append, while a genuine re-upload (new file_id) still appends a new
    asset (reference semantics, app.py:385-390 + 441-447)."""
    rec = _Recorder()
    uploads = [
        FIXTURES / "BTC_USD 7 Years Weekly.csv",
        FIXTURES / "ETH_USD 7 Years Weekly.csv",
    ]
    st = _make_streamlit(rec, uploads)
    upload_cls = type(st.file_uploader()[0])  # the mock's _UploadFile class
    st.session_state.clear()

    def _uploader(*a, **k):
        out = []
        for i, path in enumerate(st.file_uploader_paths):
            f = upload_cls(path)  # FRESH object every rerun
            f.file_id = f"rec-{i}"
            out.append(f)
        return out

    st.file_uploader = _uploader
    plotly, go, px = _make_plotly()
    monkeypatch.setitem(sys.modules, "streamlit", st)
    monkeypatch.setitem(sys.modules, "plotly", plotly)
    monkeypatch.setitem(sys.modules, "plotly.graph_objects", go)
    monkeypatch.setitem(sys.modules, "plotly.express", px)

    for _ in range(3):  # three reruns, fresh objects each time
        sys.modules.pop("mcport.ui.app", None)
        runpy.run_module("mcport.ui.app", run_name="app")
    assert len(st.session_state["uploaded_dfs"]) == 2, "rerun re-appended"

    st.file_uploader_paths.append(uploads[0])  # genuine re-upload: new id
    sys.modules.pop("mcport.ui.app", None)
    runpy.run_module("mcport.ui.app", run_name="app")
    assert len(st.session_state["uploaded_dfs"]) == 3
    assert rec.errors == []
