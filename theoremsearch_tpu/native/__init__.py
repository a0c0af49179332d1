"""C++ host-runtime source (built on demand by utils/native.py)."""
