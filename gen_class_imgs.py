from scal_sdt_tpu.cli.gen_class_imgs import main

if __name__ == '__main__':
    import logging
    logging.basicConfig(level='INFO')
    main()
