"""Application shell: headless CLI simulation runner + frame dumper.

Replaces the reference's Electron/astilectron desktop shell (ref: dslapp/ —
whose GUI->sim wiring was never completed, SURVEY.md caveats) with the
offline-first CLI SURVEY.md §7.10 prescribes: run a configured sim, render
frames, export animations/checkpoints.
"""
