"""Single-modal Torchreid-style entry point.

Reference analog: ``scripts/main.py`` — same skeleton as the multi-modal
entry (``mainMultiModal.py``) without multi-modal engine dispatch. Both
paths share the implementation here; the engine dispatch in
``main_multimodal.py`` already selects single-modal engines when the
datamanager carries one stream.
"""

from main_multimodal import main

if __name__ == "__main__":
    main()
