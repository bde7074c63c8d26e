/* hand-written config.h for scratch parity build (no autotools in image) */
#ifndef CONFIG_H
#define CONFIG_H 1
#define PACKAGE "abyss"
#define PACKAGE_BUGREPORT "abyss-users@bcgsc.ca"
#define PACKAGE_NAME "ABySS"
#define PACKAGE_STRING "ABySS 2.3.10"
#define PACKAGE_TARNAME "abyss"
#define PACKAGE_URL ""
#define PACKAGE_VERSION "2.3.10"
#define VERSION "2.3.10"
#define MAX_KMER 192
#define MAX_HASHES 32
#define FMBITS 64
#define HAVE_UNORDERED_MAP 1
#define HAVE_UNORDERED_SET 1
#define HAVE_STD_HASH 1
#define HAVE_GETPAGESIZE 1
#define HAVE_DECL_STRERROR_R 1
#define HAVE_STRERROR_R 1
#define STRERROR_R_CHAR_P 1
#define HAVE_WORKING_VFORK 1
#define HAVE_WORKING_FORK 1
#define HAVE_VFORK 1
#define HAVE_FORK 1
#define HAVE_DLFCN_H 1
#define HAVE_ZLIB_H 1
#define HAVE_LIBZ 1
#define HAVE_LIBDL 0
#endif
