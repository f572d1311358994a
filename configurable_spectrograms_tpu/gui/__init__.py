"""GUI support: a headless structural PySide6 stand-in.

The reference front-end is a PySide6 application (reference
GUI_batch_download_plot_FAST.py); this environment ships no Qt, so
:mod:`.headless_qt` provides the API slice the front-end uses with real
(headless) behavior -- signals, event loop, widget state -- letting
``run_qt()`` execute and be tested without a display or Qt install.
"""
