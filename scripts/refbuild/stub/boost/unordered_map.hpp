// boost::unordered_map -> std (scratch parity build)
#ifndef STUB_BOOST_UNORDERED_MAP
#define STUB_BOOST_UNORDERED_MAP 1
#include <unordered_map>
namespace boost { using std::unordered_map; }
#endif
