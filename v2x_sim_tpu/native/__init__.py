"""Native (C++) runtime components. See loader.py for the IO fast path."""
