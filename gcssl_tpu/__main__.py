from gcssl_tpu.cli import main

raise SystemExit(main())
