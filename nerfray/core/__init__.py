"""Pure-Python kernel: no Ray imports anywhere in this subpackage.

Modules mirror the reference's semantic units (citations into
/root/reference in each module docstring):

- tokenize  — whitespace/URI/punctuation tokenizer (Tokenize.hs:41-50)
- ox        — prefix/suffix/shape/pack text helpers (monad-ox, SURVEY §8.4)
- schema    — SchemaConf + feature blocks (Schema.hs)
- iob       — extended-IOB codec for nested spans (data-named, SURVEY §8.1)
- crf       — first-order linear-chain CRF (crf-chain1/sgd, SURVEY §8.2-8.3)
- enamex    — inline-tag corpus format parse/render (README.md:36-50)
- sync      — tokenization re-sync of span forests (Tokenize.hs:101-186)
- compare   — per-label TP/FP/FN span stats (Compare.hs)
"""
