"""Task CLIs (component C12) — the reference's preserved entry-point surface."""
