"""Streamlit UI for the live demo (reference src/app.py:267-731 main()).

Sidebar tabs Controls / Faces / History, webcam start/stop, bbox+label
overlay, add/rename/delete reference faces, auto-prompt for unknown faces.
Launched via ``python run.py demo`` (serve/app.py run_demo)."""

from __future__ import annotations

import time

import numpy as np
import streamlit as st

from facerec_tpu.config import ServeConfig
from facerec_tpu.serve.app import FaceDemo, build_default_pipeline, synthetic_frame_source


@st.cache_resource
def _load_demo(use_synthetic: bool):
    cfg = ServeConfig()
    pipe = build_default_pipeline(config=cfg)
    source = synthetic_frame_source(pipe.frame_hw) if use_synthetic else None
    return FaceDemo(pipe, cfg, frame_source=source)


def _draw(frame: np.ndarray, faces: list[dict]) -> np.ndarray:
    import cv2

    img = frame.copy()
    for f in faces:
        x1, y1, x2, y2 = [int(v) for v in f["box"]]
        known = f["name"] != "Unknown"
        color = (0, 255, 0) if known else (255, 80, 80)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        label = f"{f['name']} ({f['distance']:.2f})" if known else "Unknown"
        cv2.putText(img, label, (x1, max(y1 - 8, 12)), cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
    return img


def main() -> None:
    st.set_page_config(page_title="Face Recognition (TPU)", layout="wide")
    st.title("Real-time Face Recognition — TPU pipeline")
    use_synthetic = st.sidebar.checkbox("Synthetic camera (no webcam)", value=False)
    demo = _load_demo(use_synthetic)

    tab_controls, tab_faces, tab_history = st.sidebar.tabs(["Controls", "Faces", "History"])
    with tab_controls:
        if st.button("Start" if demo._thread is None else "Restart"):
            demo.stop()
            demo.start()
        if st.button("Stop"):
            demo.stop()
        st.metric("gallery size", demo.pipeline.gallery.count)
    with tab_faces:
        for name in list(demo.pipeline.gallery.names):
            c1, c2, c3 = st.columns([3, 1, 1])
            c1.write(name)
            new = c2.text_input("rename", key=f"rn_{name}", label_visibility="collapsed")
            if new and c2.button("ok", key=f"rok_{name}"):
                demo.pipeline.gallery.rename(name, new)
                demo.pipeline.gallery.save()
            if c3.button("x", key=f"del_{name}"):
                demo.remove_reference(name)
        if st.button("Clear all references"):
            demo.pipeline.gallery.clear()
            demo.pipeline.gallery.save()
    with tab_history:
        for h in demo.history[-50:][::-1]:
            st.write(f"{h['time']} — {h['name']} ({h['distance']:.2f})")

    # Unknown-face capture flow (reference app.py:683-693): the capture
    # state lives in demo.capture (UnknownCapture, armed by the processing
    # loop), NOT in per-iteration widgets. Streamlit widgets must be created
    # once per script run with STABLE keys — the previous per-frame
    # key=f"unk_{time.time()}" created a fresh widget every loop iteration,
    # resetting the input before the user could type. Any widget interaction
    # reruns the script, which re-renders this form from the persistent
    # capture state (demo itself persists via st.cache_resource).
    cap = demo.capture
    if cap.pending is not None:
        with st.container():
            c_img, c_form = st.columns([1, 3])
            if cap.pending["crop"].size:
                c_img.image(cap.pending["crop"], caption="Unknown face", width=120)
            name = c_form.text_input("Unknown face detected — name to add:",
                                     key="unknown_name")
            c1, c2 = c_form.columns(2)
            if c1.button("Add reference", key="unknown_add") and name:
                if cap.name(name):
                    st.success(f"added {name}")
                    # drop the stale text so the NEXT captured stranger gets an
                    # empty field — otherwise one click enrolls them under the
                    # previous person's name (pop-then-rerun is the streamlit
                    # pattern; assigning to an instantiated widget key raises)
                    st.session_state.pop("unknown_name", None)
                    st.rerun()
            if c2.button("Dismiss", key="unknown_dismiss"):
                cap.dismiss()
                st.session_state.pop("unknown_name", None)
                st.rerun()

    placeholder = st.empty()
    pending_note = st.empty()
    while demo._thread is not None and demo._thread.is_alive():
        try:
            frame, faces = demo.result_q.get(timeout=0.2)
        except Exception:
            time.sleep(0.05)
            continue
        placeholder.image(_draw(frame, faces), channels="RGB")
        if cap.pending is not None:
            pending_note.info("Unknown face captured — use the form above to "
                              "name it (any interaction refreshes the app).")
        else:
            pending_note.empty()


if __name__ == "__main__":
    main()
