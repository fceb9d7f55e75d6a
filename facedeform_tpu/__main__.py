from facedeform_tpu.cli import main

raise SystemExit(main())
