"""spark-submit application entry point.

A thin launcher OUTSIDE the amp package: spark-submit executes the app
file as __main__ with no package context, so the package module
(amp/pipeline.py, which uses relative imports) cannot be the app file
itself — it arrives on the executors and the driver via
--py-files amp.zip instead (see scripts/submit.sh).
"""

from amp.pipeline import main

if __name__ == "__main__":
    main()
