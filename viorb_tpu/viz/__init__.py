"""Headless visualization (reference Viewer/FrameDrawer/MapDrawer,
src/Viewer.cc:54-120 — redesigned as PNG dumps for display-less TPU hosts)."""

from viorb_tpu.viz.drawers import FrameDrawer, MapDrawer, Viewer
