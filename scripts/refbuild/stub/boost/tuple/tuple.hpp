// minimal boost::tuple -> std::tuple mapping (scratch parity build)
#ifndef STUB_BOOST_TUPLE
#define STUB_BOOST_TUPLE 1
#include <tuple>
namespace boost {
using std::tuple;
using std::tie;
using std::make_tuple;
using std::get;
}
#endif
