"""Render the text-mesh scene (ref examples/test_text.rs)."""
import os, sys, runpy
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.argv += ["--scene", "test_text"]
runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)), "semesterbild.py"), run_name="__main__")
